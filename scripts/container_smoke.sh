#!/usr/bin/env bash
# Container-less stand-in for `docker build && docker run` (this sandbox
# has no Docker daemon, no network, and no `wheel` module, so a real
# `pip install .` cannot build). Instead this stages the package into a
# CLEAN venv's site-packages — byte-for-byte what the wheel install in
# the Dockerfile lays down — and runs the Dockerfile's CMD from OUTSIDE
# the repo so imports resolve from the installed copy, never the
# working tree. In a real container the Dockerfile's
# `pip install --no-deps .` performs this same step.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
VENV="$(mktemp -d)/venv"

python -m venv --system-site-packages "$VENV"
SITE="$("$VENV/bin/python" -c 'import sysconfig; print(sysconfig.get_paths()["purelib"])')"
cp -r "$REPO/spotify_app_etl_spark" "$SITE/"
find "$SITE/spotify_app_etl_spark" -name __pycache__ -type d -exec rm -rf {} +

# Only the __spark_entry__ shim (not part of the wheel) rides along on
# PYTHONPATH — staged alone so the repo root cannot shadow the venv.
SHIM="$(mktemp -d)"
cp "$REPO/__spark_entry__.py" "$SHIM/"

cd /tmp
PYTHONPATH="$SHIM" "$VENV/bin/python" - <<'EOF'
import spotify_app_etl_spark
assert "site-packages" in spotify_app_etl_spark.__file__, spotify_app_etl_spark.__file__
import __spark_entry__ as e
from spotify_app_etl_spark.session import get_spark

df = e.entry(get_spark(app_name="container-smoke"))
n = df.count()
assert n >= 0 and len(df.schema.fields) > 0
print(f"container smoke OK: {n} rows, schema {df.schema.simpleString()[:120]}")
EOF
