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
