#!/bin/sh
# Tool checks (parity: reference sat/path.sh): verify the python environment
# provides the vits_tpu package and the native dataio library is built.
python3 -c "import vits_tpu" 2>/dev/null || { echo "vits_tpu not importable"; exit 1; }
[ -f "$(dirname "$0")/../vits_tpu/native/libvitsdataio.so" ] || \
  make -C "$(dirname "$0")/../vits_tpu/native" >/dev/null 2>&1 || true
