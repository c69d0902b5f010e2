"""Package shipping to executor Python workers (session._ship_package).

An external driver may embed ``__spark_entry__`` from any cwd; executor
Python workers then cannot import ``spotify_app_etl_spark`` unless the
package is shipped via ``sc.addPyFile`` (cloudpickle serializes
module-level functions by reference). These tests pin the zip layout
and the once-per-application guard; the end-to-end proof is the driver
simulation (.claude/skills/verify), which runs every UDF-bearing query
from a hostile session with cwd=/tmp.
"""

from __future__ import annotations

import tempfile
import zipfile
from pathlib import Path

from spotify_app_etl_spark import session as S


def _zip_path(spark) -> Path:
    app = spark.sparkContext.applicationId
    return Path(tempfile.gettempdir()) / f"spark_graft_pkg_{app}.zip"


def test_ship_package_zip_contains_full_package(spark):
    S._ship_package(spark)
    zpath = _zip_path(spark)
    assert zpath.exists()
    names = set(zipfile.ZipFile(zpath).namelist())
    # importable as a package, with every subpackage the UDF kernels use
    for required in (
        "spotify_app_etl_spark/__init__.py",
        "spotify_app_etl_spark/sources/rest.py",
        "spotify_app_etl_spark/sources/spotify_mock.py",
        "spotify_app_etl_spark/functions/multimodal.py",
        "spotify_app_etl_spark/operators/dedup.py",
        "spotify_app_etl_spark/schemas.py",
    ):
        assert required in names


def test_ship_package_registered_with_spark(spark):
    S._ship_package(spark)
    # Spark tracks python includes; our zip must be among them so every
    # subsequently launched task prepends it to the worker sys.path.
    includes = set(spark.sparkContext._python_includes)
    assert any("spark_graft_pkg_" in inc for inc in includes)


def test_ship_package_once_per_application(spark):
    S._ship_package(spark)
    app = spark.sparkContext.applicationId
    assert app in S._SHIPPED
    before = _zip_path(spark).stat().st_mtime_ns
    S._ship_package(spark)  # second call: no rebuild, no re-register error
    assert _zip_path(spark).stat().st_mtime_ns == before
