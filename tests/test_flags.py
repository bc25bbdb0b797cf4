"""TCE_* environment-flag registry (VERDICT r3 #8): every flag the code
reads is declared in core/flags.py, and unrecognized TCE_* vars warn."""

import subprocess
import sys
import warnings

from tinychatengine_tpu.core.flags import KNOWN_FLAGS, warn_unknown_flags


def test_registry_covers_every_flag_read_in_the_tree():
    """Grep the package + scripts + bench for TCE_* names; each must be
    registered (adding a flag without declaring it fails here)."""
    import pathlib
    import re

    root = pathlib.Path(__file__).resolve().parent.parent
    used = set()
    for sub in ("tinychatengine_tpu", "scripts", "bench.py"):
        p = root / sub
        files = [p] if p.is_file() else sorted(p.rglob("*.py"))
        for f in files:
            used |= set(re.findall(r"TCE_[A-Z_]+", f.read_text()))
    missing = used - set(KNOWN_FLAGS)
    assert not missing, f"flags read but not registered: {sorted(missing)}"


def test_unknown_flag_warns():
    env = {"TCE_NO_CTXCAPP": "1", "TCE_NO_CTXCAP": "1", "PATH": "/bin"}
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        bad = warn_unknown_flags(env)
    assert bad == ["TCE_NO_CTXCAPP"]
    assert any("TCE_NO_CTXCAPP" in str(w.message) for w in rec)


def test_known_flags_do_not_warn():
    env = {k: "1" for k in KNOWN_FLAGS}
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        bad = warn_unknown_flags(env)
    assert bad == [] and not rec


def test_import_time_warning_fires():
    """The guard runs at package import: a subprocess with a typo'd flag
    must print the RuntimeWarning."""
    r = subprocess.run(
        [sys.executable, "-W", "always::RuntimeWarning", "-c",
         "import tinychatengine_tpu"],
        capture_output=True, text=True, timeout=120,
        env={"TCE_TYPO_FLAG": "1", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": str(__import__("pathlib").Path(
                 __file__).resolve().parent.parent)},
    )
    assert r.returncode == 0, r.stderr
    assert "TCE_TYPO_FLAG" in r.stderr
