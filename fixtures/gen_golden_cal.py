#!/usr/bin/env python3
"""Calibrated-mode golden fixtures: fit per-learner calibration on the
reference's easy bootstrap (exact-text groups), then score the same pair set
through the arbiter with use_calibrated=True — including the escalation
path — and dump params + decisions."""
import json, os, sys
SHADOW = "/tmp/refroot"
sys.path.insert(0, SHADOW)
OUT = os.path.dirname(os.path.abspath(__file__))

from src.features.text_preproc import build_document_view
from src.ensemble.arbiter import Arbiter, ArbiterConfig
from src.learners.base import LearnerConfig
from src.learners.simhash_model import SimHashLearner
from src.learners.minhash_model import MinHashLearner
from src.learners.embed_model import EmbeddingLearner
from src.pipelines.near_duplicate import _build_easy_bootstrap

docs = [json.loads(l) for l in open(f"{OUT}/corpus.jsonl", encoding="utf-8")]
views = [build_document_view(doc_id=d["url"], text=d["text"], language="en") for d in docs]
view_by_id = {v.doc_id: v for v in views}

pos, neg = _build_easy_bootstrap(views, max_pos=50000, max_neg=50000)
print(f"bootstrap: {len(pos)} pos, {len(neg)} neg")

sim = SimHashLearner(LearnerConfig(extras={"decision_threshold": 0.75}))
mnh = MinHashLearner(LearnerConfig(extras={"decision_threshold": 0.75}))
emb = EmbeddingLearner(LearnerConfig(extras={"cosine_threshold": 0.988}))
learners = [sim, mnh, emb]
for ln in learners:
    ln.prepare(None)
    ln.fit_calibration(pos, neg)

params = {}
for ln in learners:
    st = ln.get_state()
    cal = st.calibration
    lp = st.learned_params or {}
    params[ln.name] = {
        "method": cal.method, "threshold": cal.threshold,
        "brier": cal.brier_score,
        "platt_a": lp.get("platt_a"), "platt_b": lp.get("platt_b"),
        "bin_edges": lp.get("bin_edges", []), "bin_probs": lp.get("bin_probs", []),
    }
with open(f"{OUT}/golden_cal_params.jsonl", "w") as f:
    for k, v in params.items():
        f.write(json.dumps({"learner": k, **v}) + "\n")
print({k: (v["method"], v["threshold"]) for k, v in params.items()})

arb = Arbiter(learners, ArbiterConfig(use_calibrated=True))

# same pair universe as golden_decisions.jsonl
pairs = sorted({(r["a"], r["b"]) for r in
                (json.loads(l) for l in open(f"{OUT}/golden_decisions.jsonl"))})
rows = []
for a, b in pairs:
    tr = arb.score_pair(view_by_id[a], view_by_id[b])
    outs = tr.learner_outputs
    def prob(name):
        o = outs.get(name)
        return None if o is None or o.prob is None else float(o.prob)
    def raw(name):
        o = outs.get(name)
        return None if o is None or o.raw_score is None else float(o.raw_score)
    rows.append({
        "a": a, "b": b, "pair_key": tr.pair_key, "label": tr.final_label,
        "dup_kind": tr.dup_kind, "reason": tr.reason, "steps": tr.escalation_steps,
        "sim_prob": prob("simhash"), "min_prob": prob("minhash"), "emb_prob": prob("embedding"),
        "sim_raw": raw("simhash"), "min_raw": raw("minhash"), "emb_raw": raw("embedding"),
    })
with open(f"{OUT}/golden_decisions_cal.jsonl", "w") as f:
    for r in rows:
        f.write(json.dumps(r) + "\n")

from collections import Counter
print(Counter(r["label"] for r in rows))
print(Counter(tuple(r["steps"]) for r in rows if r["steps"]))
