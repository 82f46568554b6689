#!/usr/bin/env python3
"""Golden vectors for the SimHash featurization modes (G2/G3/G4):
reference simhash under unigram / wshingle(k=3) / cngram(n=5) /
pos_bucket=8 over the golden corpus docs, as 128-bit hex.
Uses the reference's own _tokenize/_word_shingles/_char_ngrams/
_simhash_from_tokens with the learner defaults (min_len=2, empty
stopwords, strict=False, strip_ids=False, max_w=255, bits=128).
"""
import json
import os
import subprocess
import sys

REF = "/root/reference"
SHADOW = "/tmp/refroot"
OUT = os.path.dirname(os.path.abspath(__file__))

if not os.path.isdir(f"{SHADOW}/src"):
    os.makedirs(SHADOW, exist_ok=True)
    subprocess.run(["cp", "-rs", f"{REF}/src", f"{SHADOW}/src"], check=True)
low = f"{SHADOW}/src/learners"
if not os.path.exists(low):
    os.symlink(f"{REF}/src/Learners", low)
sys.path.insert(0, SHADOW)

from src.features.text_preproc import normalize_text
from src.learners.simhash_model import (_tokenize, _word_shingles,
                                        _char_ngrams, _simhash_from_tokens)

MAX_W, BITS = 255, 128

corpus = [json.loads(l) for l in open(f"{OUT}/corpus.jsonl", encoding="utf-8")]
rows = []
for d in corpus[:150]:  # 150 docs x 4 modes is plenty of surface
    norm = normalize_text(d["text"])
    toks = _tokenize(norm, 2, set(), False, False)
    uni = _simhash_from_tokens(toks, MAX_W, BITS)
    wsh = _simhash_from_tokens(_word_shingles(toks, 3), MAX_W, BITS)
    cng = _simhash_from_tokens(_char_ngrams(norm, 5, strict=False), MAX_W, BITS)
    pos_toks = [f"{tok}@{i//8}" for i, tok in enumerate(toks)]
    pos = _simhash_from_tokens(pos_toks, MAX_W, BITS)
    rows.append({
        "url": d["url"],
        "uni_hex": f"{uni:032x}",
        "wsh_hex": f"{wsh:032x}",
        "cng_hex": f"{cng:032x}",
        "pos_hex": f"{pos:032x}",
    })

with open(f"{OUT}/simhash_modes_golden.jsonl", "w", encoding="utf-8") as fh:
    for r in rows:
        fh.write(json.dumps(r) + "\n")
print(f"wrote {len(rows)} rows")
