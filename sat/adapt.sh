#!/bin/sh
# Speaker-adaptive training driver (parity: reference sat/adapt.sh).
# Thin wrapper over vits_tpu.sat.run_adapt (data prep, scp building,
# adapt-mode finetune from pretrain/, greedy-soup export, spkid.map + banks).
cd "$(dirname "$0")"
outdir=../checkpoint
while [ $# -gt 0 ]; do
  case "$1" in
    --outdir) outdir="$2"; shift 2 ;;
    *) echo "unknown option $1"; exit 1 ;;
  esac
done
exec python3 -c "import vits_tpu.sat as s; s.run_adapt('.', '$outdir')"
