"""Speaker-adaptive training (SAT) — few-shot voice cloning orchestration.

Capability parity with the reference sat/adapt.sh (1-123) + sat/pre_data.sh
(1-83), reimplemented as a Python module (the shell scripts remain as thin
wrappers): per-speaker data prep (denoise/trim + emotion extraction/clustering
+ text→vector, with the external tools pluggable), reserved map-id assignment
counting down from 1023, train/valid scp building with replication to ≥50
lines, adapt-mode finetuning from pretrained G/D (fresh optimizer, step cap —
train.py:149-150, utils.py:22-27), checkpoint pruning, greedy-soup export, and
emission of `spkid.map` + per-speaker `<spkid>.emo` banks that the serving
stack hot-reloads (infer.py:118-133).
"""

from __future__ import annotations

import glob
import json
import logging
import os
import shutil
from typing import Callable, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

RESERVED_TOP_MAPID = 1023
MIN_TRAIN_LINES = 50


def default_text_frontend(txt_path: str, vec_path: str, text_channels: int):
    """text -> .vec frontend hook. The real `text-parser` CLI is external
    (pre_data.sh:60-69); fall back to the deterministic hash frontend."""
    from vits_tpu.vits_wrap import HashTextFrontend
    fe = HashTextFrontend(text_channels)
    with open(txt_path, "rt", encoding="utf-8") as f:
        text = f.read().strip()
    _, _, vec = fe("u", text)
    vec.astype(np.float32).tofile(vec_path)


def default_emotion_extractor(wav_path: str, emo_path: str):
    """wav -> 1024-d .emo hook (toolkits/extract_emotion.py equivalent)."""
    from vits_tpu.toolkits.extract_emotion import extract_to_file
    extract_to_file(wav_path, emo_path)


def prepare_speaker_data(spk_dir: str, work_dir: str, spkid: str, hps,
                         text_frontend: Optional[Callable] = None,
                         emotion_extractor: Optional[Callable] = None,
                         denoiser: Optional[Callable] = None,
                         n_emotion_clusters: int = 3) -> List[str]:
    """Per-speaker prep (pre_data.sh): returns scp lines
    `vec|wav|emo|spkid`. wav+txt pairs expected in spk_dir."""
    from vits_tpu.toolkits.cluster_emotion import cluster_emotions
    from vits_tpu.toolkits.trim_sil import trim_silence_file

    text_frontend = text_frontend or default_text_frontend
    emotion_extractor = emotion_extractor or default_emotion_extractor
    out_dir = os.path.join(work_dir, spkid)
    os.makedirs(out_dir, exist_ok=True)
    lines = []
    emo_paths = []
    for wav in sorted(glob.glob(os.path.join(spk_dir, "*.wav"))):
        base = os.path.splitext(os.path.basename(wav))[0]
        txt = os.path.join(spk_dir, base + ".txt")
        if not os.path.exists(txt):
            logger.warning("no transcript for %s; skipped", wav)
            continue
        wav_out = os.path.join(out_dir, base + ".wav")
        if denoiser is not None:
            denoiser(wav, wav_out)  # denoise8k-infer equivalent hook
        else:
            trim_silence_file(wav, wav_out, target_sr=hps.data.sampling_rate)
        emo_out = os.path.join(out_dir, base + ".emo")
        emotion_extractor(wav_out, emo_out)
        emo_paths.append(emo_out)
        vec_out = os.path.join(out_dir, base + ".vec")
        text_frontend(txt, vec_out, hps.data.text_channels)
        lines.append(f"{vec_out}|{wav_out}|{emo_out}|{spkid}")
    if emo_paths:
        bank = cluster_emotions(emo_paths, k=n_emotion_clusters)
        bank.astype(np.float32).tofile(os.path.join(out_dir, f"{spkid}.emo"))
    return lines


def run_adapt(sat_dir: str, out_dir: str, *, config_path: Optional[str] = None,
              pretrain_g: Optional[str] = None, pretrain_d: Optional[str] = None,
              text_frontend=None, emotion_extractor=None, denoiser=None,
              max_steps: Optional[int] = None, mesh=None) -> Dict[str, int]:
    """Full adapt flow (adapt.sh:20-123). Returns {spkid: mapid}.

    sat_dir layout: data/<spkid>/*.wav+*.txt, configs/adapt.json,
    pretrain/G_0.npz [D_0.npz]; out_dir: deployment checkpoint dir.
    """
    from vits_tpu.config import get_hparams_from_file
    from vits_tpu.train.loop import run as train_run
    from vits_tpu.utils import checkpoint as ckpt_mod
    import vits_tpu.export as export_mod

    config_path = config_path or os.path.join(sat_dir, "configs", "adapt.json")
    hps = get_hparams_from_file(config_path)
    work_dir = os.path.join(sat_dir, "work")
    os.makedirs(work_dir, exist_ok=True)
    os.makedirs(out_dir, exist_ok=True)

    # enumerate speakers, assign reserved map ids downward (adapt.sh:28-39)
    spk_dirs = sorted(d for d in glob.glob(os.path.join(sat_dir, "data", "*"))
                      if os.path.isdir(d) and os.path.basename(d).isdigit())
    if not spk_dirs:
        raise FileNotFoundError(f"no speaker data under {sat_dir}/data")
    mapping: Dict[str, int] = {}
    # reserved ids count down from 1023 (adapt.sh:28-39); clamp to the
    # config's speaker table so small configs stay in range
    mapid = min(RESERVED_TOP_MAPID, hps.data.n_speakers - 1)
    all_lines: List[str] = []
    for spk_dir in spk_dirs:
        spkid = os.path.basename(spk_dir)
        mapping[spkid] = mapid
        lines = prepare_speaker_data(spk_dir, work_dir, spkid, hps,
                                     text_frontend, emotion_extractor, denoiser)
        # remap sid to reserved internal id in scp
        lines = ["|".join(l.split("|")[:3] + [str(mapid)]) for l in lines]
        all_lines += lines
        mapid -= 1

    # train/valid scp with replication to >= MIN_TRAIN_LINES (adapt.sh:57-72)
    train_lines = list(all_lines)
    while 0 < len(train_lines) < MIN_TRAIN_LINES:
        train_lines += all_lines
    with open(os.path.join(work_dir, "train.scp"), "w") as f:
        f.write("\n".join(train_lines))
    with open(os.path.join(work_dir, "valid.scp"), "w") as f:
        f.write("\n".join(all_lines[:max(1, len(all_lines) // 10)]))

    # adapt training from pretrained checkpoints (adapt.sh:74-87)
    model_dir = os.path.join(work_dir, "adapt_run")
    os.makedirs(model_dir, exist_ok=True)
    shutil.copyfile(config_path, os.path.join(model_dir, "config.json"))
    hps.model_dir = model_dir
    hps.adapt = True
    hps.use_dur_dis = False
    hps.data.training_files = os.path.join(work_dir, "train.scp")
    hps.data.validation_files = os.path.join(work_dir, "valid.scp")
    hps.ckptG = pretrain_g or os.path.join(sat_dir, "pretrain", "G_0.npz")
    hps.ckptD = pretrain_d or os.path.join(sat_dir, "pretrain", "D_0.npz")
    if not os.path.exists(hps.ckptG):
        hps.ckptG = None
    if not os.path.exists(hps.ckptD):
        hps.ckptD = None
    train_run(hps, variant="mel", max_steps=max_steps, mesh=mesh)

    # prune + export greedy soup (adapt.sh:89-97)
    ckpt_mod.prune_checkpoints(model_dir, keep=5, regex="G_*.npz")
    ckpt_mod.prune_checkpoints(model_dir, keep=5, regex="D_*.npz")
    export_mod.main(["--outdir", out_dir, "--checkpoint", model_dir,
                     "--greedy", "5", "--verbose", "0"])

    # emit spkid.map + per-speaker emo banks (adapt.sh:100-114)
    with open(os.path.join(out_dir, "spkid.map"), "w") as f:
        for spkid, mid in mapping.items():
            f.write(f"{spkid} {mid}\n")
    for spkid, mid in mapping.items():
        src = os.path.join(work_dir, spkid, f"{spkid}.emo")
        if os.path.exists(src):
            # bank stored under the internal map id; external id symlinked to
            # it (adapt.sh:108-114) — serving looks up by the remapped id
            dst = os.path.join(out_dir, f"{mid}.emo")
            shutil.copyfile(src, dst)
            link = os.path.join(out_dir, f"{spkid}.emo")
            if os.path.lexists(link):
                os.remove(link)
            os.symlink(os.path.basename(dst), link)
    return mapping
