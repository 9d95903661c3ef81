"""The package's lazy re-export surface (r13 t19).

The top-level ``rosbag2parquet_spark`` import must stay light: every
Python DataSource planner fork and every executor worker's first
unpickle imports it, so the eager convert/session/catalog re-exports
were moved behind PEP 562 ``__getattr__``. These tests pin both halves
of that contract: the public names still resolve (and cache), and a
bare package import does NOT drag the heavy submodules in.
"""

from __future__ import annotations

import subprocess
import sys


def test_lazy_names_resolve_and_cache():
    import rosbag2parquet_spark as pkg

    for name in pkg.__all__:
        value = getattr(pkg, name)
        assert value is not None
        # second access must hit the module dict, not __getattr__
        assert name in vars(pkg)
        assert getattr(pkg, name) is value
    assert set(pkg.__all__) <= set(dir(pkg))


def test_unknown_attribute_raises():
    import rosbag2parquet_spark as pkg

    try:
        pkg.definitely_not_a_name
    except AttributeError as exc:
        assert "definitely_not_a_name" in str(exc)
    else:
        raise AssertionError("expected AttributeError")


def test_bare_package_import_stays_light():
    # fresh interpreter: importing the package (as a planner fork does via
    # the source modules) must not pull convert/session/catalog
    code = (
        "import sys\n"
        "import rosbag2parquet_spark\n"
        "heavy = [m for m in sys.modules if m in ("
        "'rosbag2parquet_spark.convert',"
        "'rosbag2parquet_spark.session',"
        "'rosbag2parquet_spark.sources.catalog')]\n"
        "assert not heavy, heavy\n"
    )
    subprocess.run([sys.executable, "-c", code], check=True, cwd="/root/repo")
