#!/usr/bin/env python
"""Freeze the golden corpus: compute cleaned markdown for every page in
tests/golden_corpus.py and write tests/goldens/<name>.md. Run once (or
deliberately, after an intentional semantics change), review the diff,
commit."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

from golden_corpus import CORPUS  # noqa: E402

from webcrawl_spark.kernels.scrape import markdown_for_page  # noqa: E402

out_dir = os.path.join(REPO, "tests", "goldens")
os.makedirs(out_dir, exist_ok=True)
for name, (url, html) in sorted(CORPUS.items()):
    md = markdown_for_page(html, url)
    path = os.path.join(out_dir, f"{name}.md")
    with open(path, "w") as f:
        f.write(md)
    print(f"{name}: {len(md)} bytes")
