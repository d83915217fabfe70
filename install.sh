#!/usr/bin/env bash
# cortex_tpu installer (parity: reference install.sh, adapted: the
# engine is a Python package, not a prebuilt binary).
set -euo pipefail

PREFIX="${CORTEX_PREFIX:-$HOME/.cortex}"
PYTHON="${PYTHON:-python3}"

echo "installing cortex_tpu into $PREFIX"
mkdir -p "$PREFIX"
$PYTHON -m venv "$PREFIX/venv"
# shellcheck disable=SC1091
source "$PREFIX/venv/bin/activate"
pip install --quiet --upgrade pip
# TPU VMs: pip install 'jax[tpu]' instead
pip install --quiet "jax[cpu]" aiohttp grpcio protobuf cryptography numpy
pip install --quiet -e "$(cd "$(dirname "$0")" && pwd)"

mkdir -p "$PREFIX/bin"
cat > "$PREFIX/bin/cortex" <<EOF
#!/usr/bin/env bash
exec "$PREFIX/venv/bin/python" -m cortex_tpu "\$@"
EOF
chmod +x "$PREFIX/bin/cortex"

echo "done. add to PATH:  export PATH=\"$PREFIX/bin:\$PATH\""
echo "then:  cortex init && cortex serve"
