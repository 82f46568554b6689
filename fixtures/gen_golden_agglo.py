#!/usr/bin/env python3
"""Agglomerative-clustering golden fixture (X4): the reference's sub-5000-doc
unsupervised path (cli.py:190-224) is sklearn AgglomerativeClustering
(linkage='average', metric='precomputed' cosine distances, distance_threshold
= 75th percentile of the nonzero sample distances). The sandbox ships no
sklearn, so — like the whitening fixture — this generator runs a float64
numpy mirror of the documented sklearn semantics over the REFERENCE's own
embedding fallback (`_cheap_embed`) and fixture corpus:

  - vectors: _cheap_embed of build_document_view texts, corpus order,
    zero vectors filtered (cli.py:160-166; none occur on this corpus)
  - threshold: np.percentile(distances[distances > 0], 75) over the full
    square cosine-distance matrix of the first min(1000, n) vectors
  - UPGMA: repeatedly merge the globally closest pair while its
    average-linkage distance < threshold (average linkage is monotone, so
    this equals sklearn's build-then-cut); weighted-average update
  - labels: renumbered by smallest member index (partition-invariant form;
    sklearn's own label numbers depend on heap order)

Output: fixtures/agglo_golden.jsonl — line 1 {"threshold", "n", "n_clusters"},
line 2 {"labels": [...]}.
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
        os.makedirs(SHADOW, exist_ok=True)
    if not os.path.isdir(f"{SHADOW}/src"):
        subprocess.run(["cp", "-rs", f"{REF}/src", f"{SHADOW}/src"], check=True)
    low = f"{SHADOW}/src/learners"
    if not os.path.exists(low):
        os.symlink(f"{REF}/src/Learners", low)


setup_shadow()
sys.path.insert(0, SHADOW)

from src.features.text_preproc import build_document_view      # noqa: E402
from src.learners.embed_model import _cheap_embed              # noqa: E402

DIM = 384

corpus = [json.loads(l) for l in open(f"{OUT}/corpus.jsonl", encoding="utf-8")]
views = [build_document_view(doc_id=d["url"], text=d["text"], language="en")
         for d in corpus]
X = np.vstack([_cheap_embed([(v.text or "")], DIM) for v in views])  # (n, 384) f32

# zero-vector filter (cli.py:160-166)
nz = np.any(X != 0, axis=1)
assert nz.all(), "fixture corpus unexpectedly produced zero vectors"
n = X.shape[0]

X64 = X.astype(np.float64)
norms = np.sqrt((X64 * X64).sum(axis=1))
D = 1.0 - (X64 @ X64.T) / np.outer(norms, norms)
np.fill_diagonal(D, 0.0)
# ulp clamp, mirrored in Agglomerative.cosDist: identical-text pairs give
# |d| ~ 1e-16 whose sign depends on accumulation order; clamping both sides
# keeps the reference's `d > 0` percentile filter engine-independent.
D[np.abs(D) < 1e-12] = 0.0

m = min(1000, n)
S = D[:m, :m]
threshold = float(np.percentile(S[S > 0], 75))

# UPGMA merge-until-threshold, weighted-average update
d = D.copy()
active = np.ones(n, dtype=bool)
size = np.ones(n, dtype=np.int64)
members = [[i] for i in range(n)]
BIG = 1e18
work = d.copy()
np.fill_diagonal(work, BIG)
while active.sum() > 1:
    idx = np.where(active)[0]
    sub = work[np.ix_(idx, idx)]
    flat = int(np.argmin(sub))          # ties -> lowest flat index = smallest (row, col)
    r, c = divmod(flat, len(idx))
    a, b = int(idx[r]), int(idx[c])
    if a > b:
        a, b = b, a
    if sub[r, c] >= threshold:
        break
    sa, sb = int(size[a]), int(size[b])
    for k in idx:
        k = int(k)
        if k != a and k != b:
            v = (sa * d[a, k] + sb * d[b, k]) / (sa + sb)
            d[a, k] = d[k, a] = v
            work[a, k] = work[k, a] = v
    active[b] = False
    work[b, :] = BIG
    work[:, b] = BIG
    size[a] = sa + sb
    members[a].extend(members[b])
    members[b] = []

labels = np.full(n, -1, dtype=np.int64)
next_label = 0
for c in range(n):
    if active[c] and members[c]:
        for mbr in members[c]:
            labels[mbr] = next_label
        next_label += 1
assert (labels >= 0).all()

with open(f"{OUT}/agglo_golden.jsonl", "w", encoding="utf-8") as f:
    f.write(json.dumps({"threshold": threshold, "n": n,
                        "n_clusters": int(next_label)}) + "\n")
    f.write(json.dumps({"labels": [int(x) for x in labels]}) + "\n")
print(f"n={n} threshold={threshold:.6f} clusters={next_label}")
