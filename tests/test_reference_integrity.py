"""Guard: the read-only reference tree must never change again.

VERDICT r02 flagged an in-place execution of reference scripts that
rewrote two golden CSVs. tools/reference_manifest.sha256 pins the SHA-256
of every reference file as of 2026-08-17 (the two r02-touched CSVs are
pinned at their current, disclosed state — see tools/reference_manifest.py
docstring); this test fails on any future drift, including new or deleted
files. Reference code must only ever be executed from a /tmp copy.
"""

import os

import pytest

from tools.reference_manifest import MANIFEST, REF_ROOT, verify


@pytest.mark.skipif(not os.path.isdir(REF_ROOT), reason="no reference tree")
def test_reference_tree_unchanged():
    assert os.path.isfile(MANIFEST), "manifest missing — run tools/reference_manifest.py --write"
    problems = verify()
    assert not problems, (
        "reference tree drifted from committed manifest (was reference code "
        "executed in place? always copy to /tmp first):\n" + "\n".join(problems)
    )
