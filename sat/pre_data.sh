#!/bin/sh
# Per-speaker data preparation (parity: reference sat/pre_data.sh).
# Denoise/trim + emotion extraction/clustering + text->vector run inside
# vits_tpu.sat.prepare_speaker_data (external denoise8k / text-parser tools
# are pluggable hooks there).
cd "$(dirname "$0")"
spk_dir=$1; work_dir=$2; spkid=$3; config=${4:-configs/adapt.json}
exec python3 - "$spk_dir" "$work_dir" "$spkid" "$config" <<'PY'
import sys
from vits_tpu.config import get_hparams_from_file
from vits_tpu.sat import prepare_speaker_data
spk_dir, work_dir, spkid, config = sys.argv[1:5]
hps = get_hparams_from_file(config)
lines = prepare_speaker_data(spk_dir, work_dir, spkid, hps)
print("\n".join(lines))
PY
