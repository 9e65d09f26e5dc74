"""Byte-identity regression gate: kernel output must equal the frozen
goldens committed under tests/goldens/ (FIXTURES.md §2). Regenerate only
deliberately via scripts/freeze_goldens.py + review."""

import os

import pytest

from golden_corpus import CORPUS

from webcrawl_spark.kernels.scrape import markdown_for_page

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.mark.parametrize("name", sorted(CORPUS))
def test_golden_byte_identity(name):
    url, html = CORPUS[name]
    with open(os.path.join(GOLDEN_DIR, f"{name}.md")) as f:
        expected = f.read()
    assert markdown_for_page(html, url) == expected
