#!/usr/bin/env python3
"""Escalation-path golden: inject crafted calibration states (Platt centered
so probs cross thresholds near the raw decision band) into the reference
learners, then score pairs through the calibrated arbiter so the gray-zone
escalation loop actually fires."""
import json, os, sys
SHADOW = "/tmp/refroot"
sys.path.insert(0, SHADOW)
OUT = os.path.dirname(os.path.abspath(__file__))

from src.features.text_preproc import build_document_view
from src.ensemble.arbiter import Arbiter, ArbiterConfig
from src.learners.base import LearnerConfig, LearnerState, CalibrationParams
from src.learners.simhash_model import SimHashLearner
from src.learners.minhash_model import MinHashLearner
from src.learners.embed_model import EmbeddingLearner

docs = [json.loads(l) for l in open(f"{OUT}/corpus.jsonl", encoding="utf-8")]
views = [build_document_view(doc_id=d["url"], text=d["text"], language="en") for d in docs]
view_by_id = {v.doc_id: v for v in views}

# Platt sigmoid(a*x+b) centered at raw=c with slope a: prob=0.5 at c.
# threshold 0.5 => vote iff raw >= c; gray band |prob-0.5|<=0.05 <=>
# raw within ~0.05/(a/4) of c — wide enough to catch pairs for escalation.
# Flat slopes put a wide score band inside the +-0.05 gray zone so the
# escalation loop actually fires on a meaningful share of pairs.
# centers sit on the NEAR-pair score mass (sim ~0.85-0.98, jaccard
# ~0.5-0.9, cos-unit ~0.95-1.0) so those pairs are gray for all three
# learners at once and the escalation loop fires
CRAFT = {
    "simhash": {"a": 1.0, "c": 0.92},
    "minhash": {"a": 1.0, "c": 0.70},
    "embedding": {"a": 1.0, "c": 0.97},  # on (cos+1)/2 scale
}

def state_for(name):
    a = CRAFT[name]["a"]; c = CRAFT[name]["c"]
    b = -a * c
    return LearnerState(
        calibration=CalibrationParams(method="platt", params={"a": a, "b": b},
                                      threshold=0.5, brier_score=0.1,
                                      reliability_bins=[]),
        learned_params={"platt_a": a, "platt_b": b, "bin_edges": [], "bin_probs": []})

sim = SimHashLearner(LearnerConfig(extras={"decision_threshold": 0.75}))
mnh = MinHashLearner(LearnerConfig(extras={"decision_threshold": 0.75}))
emb = EmbeddingLearner(LearnerConfig(extras={"cosine_threshold": 0.988}))
for ln in (sim, mnh, emb):
    ln.prepare(None)
    ln.load_state(state_for(ln.name))

arb = Arbiter([sim, mnh, emb], ArbiterConfig(use_calibrated=True))

pairs = sorted({(r["a"], r["b"]) for r in
                (json.loads(l) for l in open(f"{OUT}/golden_decisions.jsonl"))})
rows = []
for a, b in pairs:
    tr = arb.score_pair(view_by_id[a], view_by_id[b])
    rows.append({
        "a": a, "b": b, "pair_key": tr.pair_key, "label": tr.final_label,
        "dup_kind": tr.dup_kind, "reason": tr.reason, "steps": tr.escalation_steps,
    })
with open(f"{OUT}/golden_decisions_cal2.jsonl", "w") as f:
    f.write(json.dumps({"craft": CRAFT}) + "\n")
    for r in rows:
        f.write(json.dumps(r) + "\n")

from collections import Counter
print(Counter(r["label"] for r in rows))
print("escalated:", sum(1 for r in rows if r["steps"]))
print(Counter(r["reason"] for r in rows))
