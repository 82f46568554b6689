#!/usr/bin/env python3
"""Golden-fixture generator: runs the REFERENCE code (read-only at
/root/reference, imported via a case-fix symlink shadow tree) over a
deterministic synthetic corpus and dumps:

  fixtures/norm_golden.jsonl     raw -> normalize_text/tokenize/hashes
  fixtures/corpus.jsonl          the synthetic corpus (url, text, family, kind)
  fixtures/golden_docs.jsonl     per-doc reference values: norm text, exact
                                 hash, simhash hex, tokens count, shingles
  fixtures/golden_decisions.jsonl per-pair reference arbiter decisions with
                                 per-learner raw scores
  fixtures/golden_clusters.jsonl reference clusters (sampler candidates path,
                                 exactly what run_intelligent_pipeline does in
                                 this environment) and an all-truth-pairs
                                 variant

Environment note (pinned for reproducibility): datasketch, simhash and
sentence-transformers are NOT installed, so the reference takes its
deterministic fallbacks — exact set Jaccard, manual blake2b SimHash, cheap
char-hash embedding. Those are the code paths our Scala engine ports.
"""
import json
import os
import random
import subprocess
import sys

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

from src.features.text_preproc import (normalize_text, tokenize_words,
                                       build_document_view, content_hash)
from src.ensemble.arbiter import Arbiter, ArbiterConfig
from src.learners.base import LearnerConfig
from src.learners.simhash_model import SimHashLearner
from src.learners.minhash_model import MinHashLearner
from src.learners.embed_model import EmbeddingLearner
from src.pipelines.near_duplicate import (generate_candidates, CandidateConfig,
                                          build_clusters_from_traces)

# ---------------------------------------------------------------- norm golden
ADVERSARIAL = [
    "Hello, World!",
    "  multiple   spaces\tand\ttabs  ",
    "line1\r\nline2\rline3\nline4",
    "﻿BOM prefixed text",
    "smart ‘quotes’ and “double” ones",
    "en–dash em—dash hy-phen",
    "soft­hyphen inside",
    "word wrap hy-\nphenation test",
    "nbsp separated words",
    "Page 3 of 10 header",
    "page 42 alone",
    "id 1234567890 and short 12345",
    "999999 is six digits",
    "date 2024-01-15 inline",
    "not-a-date 2024-1-5",
    "• bullet one\n‣ bullet two\n◦ bullet three\n- dash bullet\n* star bullet\n· dot bullet",
    "rule\n--\nafter",
    "rule\n-----\nafter",
    "café résumé naïve",
    "café combining accent",
    "İstanbul and ı dotless",
    "STRAẞE sharp s",
    "ΣΟΦΟΣ greek final sigma",
    "ﬁligature ﬂow",
    "① circled one ㎡ square m2",
    "superscript² fraction½",
    "中文文本测试 chinese",
    "русский текст",
    "العربية text",
    "emoji \U0001f600 smile ☃ snowman",
    "math ∑ √ ≠ ops",
    "zero​width space",
    "mixed CASE Text Here",
    "under_score kept_here",
    "trailing punctuation!!!",
    "(parens) [brackets] {braces}",
    "a b c single letters",
    "The the THE stopword test",
    "", " ", "\n\n\n",
    "Multi\n\n\nblank\n\n\n\nlines",
    "tab\there andvertical",
    "x" * 300,
    "word " * 50,
    "Page 1 of 2 Page 2 of 2 Page 3 of 2",
    "ID: 20240101999 mixed 2024-01-01 date-and-id",
    "hyphen-\r\nwindows wrap",
    "­leading soft hyphen",
    "ends with hyphen-\n",
    "“he said ‘hi’ to her”",
]

norm_rows = []
for raw in ADVERSARIAL:
    n = normalize_text(raw)
    norm_rows.append({
        "raw": raw,
        "norm": n,
        "tokens": tokenize_words(n, assume_normalized=True),
        "content_hash": content_hash(n),
    })
with open(f"{OUT}/norm_golden.jsonl", "w", encoding="utf-8") as f:
    for r in norm_rows:
        f.write(json.dumps(r, ensure_ascii=False) + "\n")

# ---------------------------------------------------------------- corpus
rng = random.Random(42)
VOCAB = []
CONS = "bcdfghjklmnpqrstvwz"
VOW = "aeiou"
for i in range(800):
    w = ""
    for s in range(2 + i % 3):
        w += CONS[(i * 7 + s * 3) % len(CONS)] + VOW[(i * 11 + s * 5) % len(VOW)]
    VOCAB.append(w + str(i % 10))

def base_text(r):
    n = 100 + r.randrange(300)
    return " ".join(r.choice(VOCAB) for _ in range(n))

SMALL = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf"]

def transform(text, kind, r):
    words = text.split(" ")
    if kind == 0:
        return text
    if kind == 1:  # case flips
        return " ".join(w.upper() if r.randrange(2) == 0 else w for w in words)
    if kind == 2:  # whitespace noise
        seps = ["  ", "\n", " ", "\t", " "]
        return "".join(w + seps[r.randrange(len(seps))] for w in words)
    if kind == 3:  # punctuation / smart quotes / dashes
        out = []
        for w in words:
            c = r.randrange(8)
            if c == 0: out.append(w + ",")
            elif c == 1: out.append(w + ".")
            elif c == 2: out.append("“" + w + "”")
            elif c == 3: out.append(w + ";")
            elif c == 4: out.append(w + "—")
            elif c == 5: out.append("‘" + w + "’")
            else: out.append(w)
        return " ".join(out)
    if kind == 4:  # special chars: page labels, bullets, dates, ids, soft hyphens
        out = []
        for i, w in enumerate(words):
            if i % 17 == 5:
                out.append("\nPage %d of 40\n" % (1 + r.randrange(40)))
            if i % 23 == 7:
                out.append("\n• ")
            if len(w) > 6 and r.randrange(4) == 0:
                w = w[:3] + "­" + w[3:]
            out.append(w + " ")
            if i % 29 == 11:
                out.append(" 2024-0%d-15 " % (1 + r.randrange(9)))
            if i % 31 == 13:
                out.append(" %d77 " % (100000 + r.randrange(899999)))
        return "".join(out)
    if kind == 5:  # near: token edits 1-8%
        pct = 1 + r.randrange(8)
        return " ".join(r.choice(SMALL) if r.randrange(100) < pct else w for w in words)
    # kind 6: independent negative
    return base_text(r)

N_FAMILIES = 60
MEMBERS = 8
docs = []          # (url, text, family, kind)
for fam in range(N_FAMILIES):
    base = base_text(rng)
    for m in range(MEMBERS):
        kind = m % 7 if m > 0 else 0
        t = base if m == 0 else transform(base, kind, rng)
        docs.append((f"https://synth.example/f{fam}/m{m}", t, fam, kind if m > 0 else 0))
for i in range(120):
    docs.append((f"https://synth.example/neg/{i}", base_text(rng), -1, 6))

with open(f"{OUT}/corpus.jsonl", "w", encoding="utf-8") as f:
    for url, t, fam, kind in docs:
        f.write(json.dumps({"url": url, "text": t, "family": fam, "kind": kind},
                           ensure_ascii=False) + "\n")

# ---------------------------------------------------------------- learners
views = [build_document_view(doc_id=url, text=t, language="en") for url, t, fam, kind in docs]
view_by_id = {v.doc_id: v for v in views}

sim = SimHashLearner(LearnerConfig(extras={"decision_threshold": 0.75}))
mnh = MinHashLearner(LearnerConfig(extras={"decision_threshold": 0.75}))
emb = EmbeddingLearner(LearnerConfig(extras={"cosine_threshold": 0.988}))
arb = Arbiter([sim, mnh, emb], ArbiterConfig(use_calibrated=False))
for ln in (sim, mnh, emb):
    ln.prepare(None)

# per-doc golden values
with open(f"{OUT}/golden_docs.jsonl", "w", encoding="utf-8") as f:
    for v in views[:80]:
        sh = mnh._get_shingles(v)
        f.write(json.dumps({
            "url": v.doc_id,
            "norm": v.text,
            "n_tokens": len(v.tokens or []),
            "exact_hash": arb._exact_hash(v),
            "content_hash": content_hash(v.text),
            "simhash_hex": "%032x" % sim._hash(v),
            "n_shingles": len(set(sh)),
            "shingles_head": sorted(set(sh))[:5],
        }, ensure_ascii=False) + "\n")

# ---------------------------------------------------------------- pairs
truth_pairs = set()
fam_members = {}
for url, t, fam, kind in docs:
    if fam >= 0 and kind != 6:
        fam_members.setdefault(fam, []).append(url)
for fam, urls in fam_members.items():
    for i in range(len(urls)):
        for j in range(i + 1, len(urls)):
            truth_pairs.add((min(urls[i], urls[j]), max(urls[i], urls[j])))

sampler_pairs = set(generate_candidates(views, CandidateConfig()))
neg_rng = random.Random(7)
ids = [v.doc_id for v in views]
neg_pairs = set()
while len(neg_pairs) < 1500:
    a, b = neg_rng.choice(ids), neg_rng.choice(ids)
    if a != b:
        neg_pairs.add((min(a, b), max(a, b)))

all_pairs = sorted(truth_pairs | sampler_pairs | neg_pairs)
print(f"scoring {len(all_pairs)} pairs "
      f"(truth {len(truth_pairs)}, sampler {len(sampler_pairs)}, neg {len(neg_pairs)})")

def trace_row(tr, outs):
    def raw(name):
        o = outs.get(name)
        return None if o is None or o.raw_score is None else float(o.raw_score)
    def cosv():
        o = outs.get("embedding")
        if o and isinstance(o.rationale, dict) and "cosine" in o.rationale:
            return float(o.rationale["cosine"])
        return None
    return {
        "a": tr.a_id, "b": tr.b_id, "pair_key": tr.pair_key,
        "label": tr.final_label, "dup_kind": tr.dup_kind, "reason": tr.reason,
        "sim_raw": raw("simhash"), "min_raw": raw("minhash"),
        "emb_raw": raw("embedding"), "emb_cos": cosv(),
        "voters": sorted(tr.agreed_learners or []),
    }

traces_all = {}
rows = []
for a, b in all_pairs:
    tr = arb.score_pair(view_by_id[a], view_by_id[b])
    traces_all[(a, b)] = tr
    rows.append(trace_row(tr, tr.learner_outputs))
with open(f"{OUT}/golden_decisions.jsonl", "w", encoding="utf-8") as f:
    for r in rows:
        f.write(json.dumps(r, ensure_ascii=False) + "\n")

# ---------------------------------------------------------------- clusters
sampler_traces = [traces_all[p] for p in sorted(sampler_pairs)]
ref_clusters = build_clusters_from_traces(sampler_traces)
alltruth_traces = [traces_all[p] for p in sorted(truth_pairs | sampler_pairs)]
full_clusters = build_clusters_from_traces(alltruth_traces)
with open(f"{OUT}/golden_clusters.jsonl", "w", encoding="utf-8") as f:
    for c in ref_clusters:
        f.write(json.dumps({"mode": "sampler", "members": c}) + "\n")
    for c in full_clusters:
        f.write(json.dumps({"mode": "alltruth", "members": c}) + "\n")

n_dup = sum(1 for r in rows if r["label"] == "DUPLICATE")
print(f"decisions: {n_dup} DUPLICATE / {len(rows)} pairs")
print(f"clusters: sampler={len(ref_clusters)} alltruth={len(full_clusters)}")
print("golden fixtures written to", OUT)
