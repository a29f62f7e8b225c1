"""CI wrapper for the compiled-reference head-to-head harness.

Runs ``tools/ref_parity.py --quick``: builds the reference's own C
extensions (/root/reference/setup.py:51-55) in a temp dir and fuzzes this
repo's distance / phred / trie-partition / dissection implementations
against them.  Skipped when the reference tree or a C compiler is absent
(e.g. on an end-user install).
"""
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/src/fastqdedup")


@pytest.mark.skipif(not REF.exists(), reason="reference tree not present")
@pytest.mark.skipif(shutil.which("gcc") is None, reason="no C compiler")
def test_reference_head_to_head_quick():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "ref_parity.py"), "--quick"],
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PARITY: OK" in proc.stdout
