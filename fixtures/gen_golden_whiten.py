#!/usr/bin/env python3
"""Whitening golden fixtures (G13): the reference ships the APPLY
(`_apply_whiten`, embed_model.py:550-566) but never fits mean/top_pc —
it only loads them from persisted state (embed_model.py:169-172). This
script therefore:

  1. fits mean + top-PC with the numpy mirror of the engine's
     deterministic fit spec (CheapEmbed.fitWhiten: float64 mean of the
     float32 embeddings; 100 power-iteration steps in float64 on the
     float32-centered sample, started from the max-variance basis
     vector, sign-fixed on the largest-|v| component), and
  2. runs the REFERENCE `_apply_whiten` with those params injected as
     the learner's loaded state (exactly the persisted-params path a
     real escalation-with-whitening run takes), dumping the whitened
     pairwise cosines for every golden-decision pair.

Output: fixtures/whiten_golden.jsonl — first line {"mean": [...],
"top_pc": [...]}, then {"a", "b", "cos_w"} per pair.
"""
import json
import os
import sys
import subprocess

import numpy as np

REF = "/root/reference"
SHADOW = "/tmp/refroot"
OUT = os.path.dirname(os.path.abspath(__file__))

def setup_shadow():
    if not os.path.isdir(SHADOW):
        subprocess.run(["cp", "-rs", f"{REF}/src", f"{SHADOW}/src"], check=False)
        os.makedirs(SHADOW, exist_ok=True)
    if not os.path.isdir(f"{SHADOW}/src"):
        subprocess.run(["cp", "-rs", f"{REF}/src", f"{SHADOW}/src"], check=True)
    low = f"{SHADOW}/src/learners"
    if not os.path.exists(low):
        os.symlink(f"{REF}/src/Learners", low)

setup_shadow()
sys.path.insert(0, SHADOW)

from src.features.text_preproc import build_document_view      # noqa: E402
from src.learners.base import LearnerConfig                    # noqa: E402
from src.learners.embed_model import EmbeddingLearner, _cheap_embed  # noqa: E402

DIM = 384
ITERS = 100

corpus = [json.loads(l) for l in open(f"{OUT}/corpus.jsonl", encoding="utf-8")]
views = [build_document_view(doc_id=d["url"], text=d["text"], language="en")
         for d in corpus]
urls = [v.doc_id for v in views]
norm_by_url = {v.doc_id: (v.text or "") for v in views}

# ---- fit (numpy mirror of CheapEmbed.fitWhiten) -------------------------
# sample = embeddings of the fit urls in SORTED url order (the engine's
# deterministic collect order)
fit_urls = sorted(urls)
X = np.vstack([_cheap_embed([norm_by_url[u]], DIM) for u in fit_urls])  # (n, 384) f32
mean64 = X.astype(np.float64).sum(axis=0) / X.shape[0]
mean = mean64.astype(np.float32)
C = (X - mean).astype(np.float32)          # centered, float32 like the apply path
var = (C.astype(np.float64) ** 2).sum(axis=0)
j0 = int(np.argmax(var))                   # lowest index on ties
v = np.zeros(DIM, dtype=np.float64)
v[j0] = 1.0
C64 = C.astype(np.float64)
for _ in range(ITERS):
    w = C64.T @ (C64 @ v)
    n = float(np.sqrt((w * w).sum()))
    if n == 0.0:
        break
    v = w / n
jm = int(np.argmax(np.abs(v)))
if v[jm] < 0:
    v = -v
top_pc = v.astype(np.float32)

# ---- apply via the REFERENCE code with injected state -------------------
emb = EmbeddingLearner(LearnerConfig(extras={
    "cosine_threshold": 0.988, "whiten": True, "remove_top_pc": True}))
emb.prepare(None)
emb._istate.mean = mean
emb._istate.top_pc = top_pc

def whitened(u):
    e = _cheap_embed([norm_by_url[u]], DIM)[0]
    return emb._apply_whiten(e)

pairs = []
decisions = [json.loads(l) for l in open(f"{OUT}/golden_decisions.jsonl", encoding="utf-8")]
seen = set()
for d in decisions:
    k = (d["a"], d["b"])
    if k in seen:
        continue
    seen.add(k)
    wa, wb = whitened(d["a"]), whitened(d["b"])
    pairs.append({"a": d["a"], "b": d["b"],
                  "cos_w": float(np.dot(wa.astype(np.float64), wb.astype(np.float64)))})

with open(f"{OUT}/whiten_golden.jsonl", "w", encoding="utf-8") as f:
    f.write(json.dumps({"mean": [float(x) for x in mean],
                        "top_pc": [float(x) for x in top_pc],
                        "n_fit_docs": len(fit_urls)}) + "\n")
    for p in pairs:
        f.write(json.dumps(p) + "\n")
print(f"wrote {len(pairs)} whitened pair cosines; fit over {len(fit_urls)} docs")
