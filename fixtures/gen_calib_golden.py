#!/usr/bin/env python3
"""Golden vectors for the calibration port: run the reference's
calibrate_adaptive_and_select_threshold / apply paths on seeded synthetic
score sets and dump params + applied probabilities."""
import json, os, random, sys
SHADOW = "/tmp/refroot"
sys.path.insert(0, SHADOW)
from src.training.calibration import (calibrate_adaptive_and_select_threshold,
                                      apply_binning_or_platt)

OUT = os.path.dirname(os.path.abspath(__file__))
cases = []
rng = random.Random(123)

def mk_case(name, n, pos_frac, noise):
    scores, labels = [], []
    for i in range(n):
        y = 1 if rng.random() < pos_frac else 0
        base = 0.75 + 0.2 * rng.random() if y else 0.35 * rng.random() + 0.2
        s = min(1.0, max(0.0, base + (rng.random() - 0.5) * noise))
        scores.append(round(s, 6)); labels.append(y)
    return {"name": name, "scores": scores, "labels": labels}

cases.append(mk_case("tiny_platt", 40, 0.4, 0.3))
cases.append(mk_case("classpoor_platt", 200, 0.01, 0.2))
cases.append(mk_case("large_binned", 2000, 0.3, 0.25))
cases.append(mk_case("clean_binned", 5000, 0.5, 0.05))

probe = [0.0, 0.1, 0.25, 0.5, 0.6, 0.7, 0.75, 0.8, 0.9, 0.95, 0.988, 1.0]
rows = []
for c in cases:
    params, extras, edges, probs = calibrate_adaptive_and_select_threshold(
        c["scores"], c["labels"])
    applied = [apply_binning_or_platt(s, params,
                                      edges if edges.size else None,
                                      probs if probs.size else None) for s in probe]
    rows.append({
        "name": c["name"], "scores": c["scores"], "labels": c["labels"],
        "method": params.method, "threshold": params.threshold,
        "brier": params.brier_score,
        "a": params.params.get("a"), "b": params.params.get("b"),
        "edges": [float(x) for x in edges], "probs": [float(x) for x in probs],
        "probe": probe, "applied": [float(x) for x in applied],
    })
with open(f"{OUT}/calib_golden.jsonl", "w") as f:
    for r in rows:
        f.write(json.dumps(r) + "\n")
print("wrote", len(rows), "calibration cases")
for r in rows:
    print(r["name"], r["method"], "th=%.6f brier=%.6f" % (r["threshold"], r["brier"]))
