#!/bin/bash
# Formatting/lint pass (the role of the reference's run_clang_format).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m compileall -q mg_ic_code_tpu tests
if command -v ruff >/dev/null 2>&1; then
  ruff check mg_ic_code_tpu tests
elif python -c "import flake8" 2>/dev/null; then
  python -m flake8 --max-line-length=88 mg_ic_code_tpu tests
else
  echo "no linter available; compileall passed"
fi
if command -v clang-format >/dev/null 2>&1; then
  clang-format -i native/*.cpp
fi
