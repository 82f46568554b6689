#!/usr/bin/env python3
"""Golden vectors for the remaining text_preproc operators:
drop_repeating_lines (N0), sentence_split (N3), filename_tokens (N4).
Runs the REFERENCE implementations and dumps input -> output pairs for the
Scala parity spec (NormExtraParitySpec).
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

from src.features.text_preproc import (drop_repeating_lines, sentence_split,
                                       filename_tokens)

TEXTS = [
    "",
    "single line",
    "a\na\na\nb",
    "a\na\nb",                      # only 2 repeats: kept
    "header\nbody one\nheader\nbody two\nheader\nbody three\nheader",
    "  padded  \n  padded  \n  padded  \nkeep",
    "x" * 121 + "\n" + "x" * 121 + "\n" + "x" * 121 + "\nshort",  # > maxLen kept
    "x" * 120 + "\n" + "x" * 120 + "\n" + "x" * 120 + "\nshort",  # == maxLen dropped
    "nav menu\ncontent A\nnav menu\ncontent B\nnav menu\ncontent C\n\n\nnav menu",
    "crlf\r\ncrlf\r\ncrlf\r\nend",
    "cr\rcr\rcr\rend",
    "mixed\nmixed\r\nmixed\rtail",
    "\n\n\n",
    "One. Two! Three? Four",
    "No terminator here",
    "Dr. Smith went home. He slept.",
    "multi\nline\nsplit",
    "sentence one.  double space. three!\nnewline part",
    "trailing spaces end.   ",
    "!? punct only",
    "a.b.c",
    "Page 1. \n\n Page 2? Done",
]

FILENAMES = [
    "",
    "report.pdf",
    "/path/to/Annual_Report-2024.pdf",
    "C:\\Users\\me\\My Documents\\tax_return.FINAL.docx",
    "no_extension",
    "lots.of.dots.in.name.txt",
    "1234567.csv",
    "12 34 alpha56 x.txt",
    "UPPER_case-Mixed.TXT",
    "weird!@#$%^&()chars.md",
    "a/b/c/d/e/deep_nested_file_name_with_many_many_tokens_one_two_three_four_five_six_seven_eight_nine_ten_eleven_twelve_thirteen_fourteen_fifteen_sixteen_seventeen_eighteen_nineteen_twenty_extra.log",
    "résumé_café.pdf",
    "file.verylongext",
    ".hidden",
    "dir.with.dots/actual-file.json",
    "trailing/slash/",
]

rows = []
for t in TEXTS:
    rows.append({
        "kind": "drop_repeating_lines",
        "input": t,
        "out_text": drop_repeating_lines(t),
        "out_list": None,
    })
    rows.append({
        "kind": "sentence_split",
        "input": t,
        "out_text": None,
        "out_list": sentence_split(t),
    })
for f in FILENAMES:
    rows.append({
        "kind": "filename_tokens",
        "input": f,
        "out_text": None,
        "out_list": filename_tokens(f),
    })

with open(f"{OUT}/norm_extra_golden.jsonl", "w", encoding="utf-8") as fh:
    for r in rows:
        fh.write(json.dumps(r, ensure_ascii=False) + "\n")
print(f"wrote {len(rows)} rows")
