"""Packaging surface: pyproject metadata and the bench module entry.

The container's setuptools predates wheel support, so a real
``pip install -e .`` cannot complete here (it fails at bdist_wheel
AFTER metadata/entry-point generation succeeds); these tests pin
everything verifiable without an install: the pyproject parses, the
package imports from source, and ``python -m datafusion_monoid_spark.
bench`` resolves to a callable ``main``.
"""

import importlib
import os
import subprocess
import sys
import tomllib

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyproject_parses_and_declares_the_package():
    with open(os.path.join(ROOT, "pyproject.toml"), "rb") as f:
        meta = tomllib.load(f)
    proj = meta["project"]
    assert proj["name"] == "datafusion-monoid-spark"
    assert "pyspark>=3.5" in proj["optional-dependencies"]["spark"]
    assert proj["scripts"]["dms-bench"] == "datafusion_monoid_spark.bench:main"


def test_bench_module_entry_importable():
    mod = importlib.import_module("datafusion_monoid_spark.bench")
    assert callable(mod.main)


def test_package_import_roundtrip_in_clean_interpreter():
    """`import datafusion_monoid_spark` + the public names, in a fresh
    interpreter with only the repo on sys.path — what an installed
    site-packages copy would exercise."""
    code = ("import datafusion_monoid_spark as m; "
            "assert callable(m.get_spark) and callable(m.register_all); "
            "import datafusion_monoid_spark.bench as b; "
            "assert callable(b.main); print('ok')")
    out = subprocess.run([sys.executable, "-c", code], cwd=ROOT,
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().endswith("ok")


def test_driver_window_covers_backlog():
    """The committed driver window must lead with every catalog entry
    that has NO driver check on record — computed from the ACTUAL
    CORRECTNESS_r*.json artifacts in the checkout, never from a
    window manifest standing in for a check (the round-6 failure:
    CORRECTNESS_r05.json was never written back, and crediting the r5
    manifest as if it had run left 28 entries unverified for two
    rounds).  New entries are sentinels in-window by construction, so
    this invariant is the per-round discipline: no entry ships
    outside the driver's gate."""
    import glob
    import json

    from datafusion_monoid_spark import queries as qcat

    seen: set = set()
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            data = json.load(f)
        assert isinstance(data, dict), f"unreadable {path}"
        seen |= set(data)
    window = list(qcat.catalog())[:50]
    never = [n for n in qcat._CATALOG if n not in seen]
    missing = [n for n in never if n not in window]
    assert not missing, (
        f"{len(missing)} never-driver-checked entries outside the "
        f"50-entry window: {missing}")


def test_r11_window_leads_with_deferred():
    """The r10 window deferred 8 r6-stale entries to fit 17 new
    sentinels; ADVICE r10 pins that deferral so the rotation cannot
    silently slip again — the r11 window MUST lead with exactly those
    8, verified against the on-disk artifacts (they are the oldest
    latest-check in the checkout)."""
    import glob
    import json

    from datafusion_monoid_spark import queries as qcat

    window = list(qcat.catalog())[:50]
    assert window[:8] == qcat._R11_DEFERRED_HEAD
    seen: dict = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            for name in json.load(f):
                seen[name] = os.path.basename(path)
    oldest = min(seen.values())
    assert {seen.get(n) for n in qcat._R11_DEFERRED_HEAD} == {oldest}
