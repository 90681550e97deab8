"""Data pipeline: scp datasets, bucketed sampling, static-shape batching.

Capability parity with the reference data_utils.py:
  * TextAudioSpeakerDataset ← TextAudioSpeakerLoader (data_utils.py:15-102):
    scp lines `vecfn|wavfn|emofn|sid`, float32 .vec text vectors, peak-
    normalized wavs, 1024-d .emo embeddings, length filtering, spectrogram
    caching beside the wav (.spec.npy here vs .spec.pt).
  * collate ← TextAudioSpeakerCollate (data_utils.py:105-163), except batches
    are padded to QUANTIZED shapes (text to multiples of text_quantum, spec to
    the bucket's upper boundary) so jit compiles a handful of shapes instead of
    one per batch.
  * BucketSampler ← DistributedBucketSampler (data_utils.py:166-262):
    length-bucketed batches, pad-to-divisible replication, per-epoch seeded
    shuffle, rank (process) striding.
  * Prefetcher: background-thread host loading + device transfer, replacing
    torch DataLoader's worker processes.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from vits_tpu.utils.audio import load_wav_norm, spectrogram_np, wav_meta


def load_filepaths_and_sid(filename: str, split: str = "|") -> List[List[str]]:
    with open(filename, encoding="utf-8") as f:
        return [line.strip().split(split) for line in f if line.strip()]


def load_binfn(filename: str, dim: int) -> np.ndarray:
    return np.fromfile(filename, dtype=np.float32).reshape(-1, dim)


class TextAudioSpeakerDataset:
    """scp-driven dataset with on-disk spectrogram caching."""

    def __init__(self, filepaths_sid_file: str, hps, cache_spec: bool = True,
                 load_spec: bool = True):
        """load_spec=False skips host-side spectrogram computation entirely —
        the training step computes the spec ON DEVICE from the waveform
        (TrainStep's no-"spec" batch path), which ships ~3× fewer bytes per
        batch through the host→device link. Keep True for eval datasets
        (evaluate() reads item["spec"])."""
        self.items = load_filepaths_and_sid(filepaths_sid_file)
        self.load_spec = load_spec
        d, t = hps.data, hps.train
        self.sampling_rate = d.sampling_rate
        self.filter_length = d.filter_length
        self.hop_length = d.hop_length
        self.win_length = d.win_length
        self.text_channels = d.text_channels
        self.segment_size = t.segment_size
        self.min_text_len = getattr(d, "min_text_len", 2)
        self.max_text_len = getattr(d, "max_text_len", 384)
        self.min_wav_len = max(self.segment_size, getattr(d, "min_wav_len", 0))
        self.max_wav_len = getattr(d, "max_wav_len", 10 * self.sampling_rate)
        self.cache_spec = cache_spec
        self._filter()
        rng = np.random.RandomState(1234)
        order = rng.permutation(len(self.items))
        self.items = [self.items[i] for i in order]
        self.lengths = [self.lengths[i] for i in order]
        self.text_lengths = [self.text_lengths[i] for i in order]

    def _filter(self):
        """Length filters + spec-frame lengths for bucketing
        (data_utils.py:39-56). Header-only: file sizes for the .vec features
        and wav_meta for the audio — no payload decode, so init is O(corpus
        entries), not O(corpus bytes)."""
        kept, lengths, text_lengths = [], [], []
        for entry in self.items:
            vecfn, wavfn = entry[0], entry[1]
            try:
                vec_len = os.path.getsize(vecfn) // (4 * self.text_channels)
                wav_len, _ = wav_meta(wavfn)
            except (OSError, ValueError):
                continue
            if self.min_text_len < vec_len < self.max_text_len and \
               self.min_wav_len < wav_len < self.max_wav_len:
                kept.append(entry)
                lengths.append(wav_len // self.hop_length)
                text_lengths.append(vec_len)
        self.items = kept
        self.lengths = lengths
        self.text_lengths = text_lengths

    def __len__(self):
        return len(self.items)

    def get_audio(self, wavfn: str) -> Tuple[np.ndarray, np.ndarray]:
        wav, sr = load_wav_norm(wavfn)
        if sr != self.sampling_rate:
            raise ValueError(f"{wavfn}: {sr} != target {self.sampling_rate}")
        spec_fn = wavfn[:-len(".wav")] + ".spec.npy"
        spec = None
        if self.cache_spec and os.path.exists(spec_fn):
            try:
                spec = np.load(spec_fn)
            except Exception:
                spec = None
        if spec is None:
            spec = spectrogram_np(wav, self.filter_length, self.hop_length, self.win_length)
            if self.cache_spec:
                try:
                    np.save(spec_fn, spec)
                except OSError:
                    pass
        return spec, wav

    def __getitem__(self, index: int):
        vecfn, wavfn, emofn, sid = self.items[index][:4]
        vec = load_binfn(vecfn, self.text_channels)
        emo = load_binfn(emofn, 1024).reshape(-1)[:1024]
        if self.load_spec:
            spec, wav = self.get_audio(wavfn)
            return {"vec": vec, "spec": spec, "wav": wav, "emo": emo, "sid": int(sid)}
        wav, sr = load_wav_norm(wavfn)
        if sr != self.sampling_rate:
            raise ValueError(f"{wavfn}: {sr} != target {self.sampling_rate}")
        return {"vec": vec, "wav": wav, "emo": emo, "sid": int(sid)}


DEFAULT_BOUNDARIES = [32, 300, 400, 500, 600, 700, 800, 900, 1000]


class BucketSampler:
    """Deterministic length-bucketed batch sampler (data_utils.py:166-262).

    num_replicas/rank: data-parallel process grid (jax.process_count /
    jax.process_index for multi-host)."""

    def __init__(self, lengths: Sequence[int], batch_size: int,
                 boundaries: Sequence[int] = DEFAULT_BOUNDARIES,
                 num_replicas: int = 1, rank: int = 0, shuffle: bool = True):
        self.lengths = list(lengths)
        self.batch_size = batch_size
        self.boundaries = list(boundaries)
        self.num_replicas = num_replicas
        self.rank = rank
        self.shuffle = shuffle
        self.buckets = self._create_buckets()
        total_bs = num_replicas * batch_size
        self.num_samples_per_bucket = [
            len(b) + ((total_bs - len(b) % total_bs) % total_bs) for b in self.buckets]
        self.total_size = sum(self.num_samples_per_bucket)
        self.num_samples = self.total_size // num_replicas

    def _bisect(self, x):
        for i in range(len(self.boundaries) - 1):
            if self.boundaries[i] < x <= self.boundaries[i + 1]:
                return i
        return -1

    def _create_buckets(self):
        buckets = [[] for _ in range(len(self.boundaries) - 1)]
        for i, l in enumerate(self.lengths):
            idx = self._bisect(l)
            if idx != -1:
                buckets[idx].append(i)
        for i in range(len(buckets) - 1, 0, -1):
            if len(buckets[i]) == 0:
                buckets.pop(i)
                self.boundaries.pop(i + 1)
        return buckets

    def bucket_upper_bound(self, bucket_idx: int) -> int:
        return self.boundaries[bucket_idx + 1]

    def epoch_batches(self, epoch: int) -> List[Tuple[int, List[int]]]:
        """Returns [(bucket_idx, [dataset indices])] for this rank/epoch."""
        g = np.random.RandomState(epoch)
        batches = []
        for bi, bucket in enumerate(self.buckets):
            if not bucket:
                continue
            ids = list(g.permutation(len(bucket))) if self.shuffle else list(range(len(bucket)))
            num_samples = self.num_samples_per_bucket[bi]
            rem = num_samples - len(bucket)
            ids = ids + ids * (rem // len(bucket)) + ids[:rem % len(bucket)]
            ids = ids[self.rank::self.num_replicas]
            for j in range(len(ids) // self.batch_size):
                batch = [bucket[k] for k in ids[j * self.batch_size:(j + 1) * self.batch_size]]
                batches.append((bi, batch))
        if self.shuffle:
            order = g.permutation(len(batches))
            batches = [batches[i] for i in order]
        return batches

    def __len__(self):
        return self.num_samples // self.batch_size


def collate(samples: List[dict], text_pad_to: int, spec_pad_to: int,
            hop_length: int, reflect_tail: int = 0,
            compact: bool = False) -> Dict[str, np.ndarray]:
    """Zero-pad to STATIC shapes: text to text_pad_to, spec frames to
    spec_pad_to, wav to spec_pad_to*hop. Sorted by spec length descending
    (data_utils.py:117-120).

    When samples carry no "spec" (dataset load_spec=False), the batch ships
    without one and the train step computes it on device. reflect_tail (the
    STFT n_fft) then continues that many samples past each wav's frame-count
    cut — real source samples when the wav extends past spec_pad*hop (the
    bucket-cap truncation case), mirrored only at the true end of the source
    — which is the continuation the reference's reflect-padded STFT of the
    full wav sees. The wav is padded reflect_tail samples PAST spec_pad*hop
    so the tail always has room; the step slices the device spectrogram back
    to spec_pad frames ((W - n_fft)//hop). Valid frames then equal the
    host/reference pipeline's (test_on_device_spec_matches_host_pipeline).

    compact=True ships the transfer-dominant tensors small: wav as int16 PCM
    (the source audio is 16-bit PCM anyway — load_wav_norm peak-normalizes,
    so requantizing at 32767 costs ~3e-5 absolute) and text/emo vectors as
    bfloat16 (the train step computes in bf16). Roughly halves host→device
    bytes per batch, which dominates real-pipeline step time on the relay."""
    with_spec = "spec" in samples[0]
    frames = (lambda s: s["spec"].shape[0]) if with_spec \
        else (lambda s: len(s["wav"]) // hop_length)
    order = np.argsort([-frames(s) for s in samples])
    samples = [samples[i] for i in order]
    B = len(samples)
    C_text = samples[0]["vec"].shape[1]
    wav_pad_to = spec_pad_to * hop_length + (0 if with_spec else reflect_tail)
    out = {
        "x": np.zeros((B, text_pad_to, C_text), np.float32),
        "x_lengths": np.zeros((B,), np.int32),
        "spec_lengths": np.zeros((B,), np.int32),
        "wav": np.zeros((B, wav_pad_to), np.float32),
        "wav_lengths": np.zeros((B,), np.int32),
        "emo": np.zeros((B, 1024), np.float32),
        "sid": np.zeros((B,), np.int32),
    }
    if with_spec:
        F = samples[0]["spec"].shape[1]
        out["spec"] = np.zeros((B, spec_pad_to, F), np.float32)
    for i, s in enumerate(samples):
        tl = min(s["vec"].shape[0], text_pad_to)
        sl = min(frames(s), spec_pad_to)
        wl = min(len(s["wav"]), spec_pad_to * hop_length)
        out["x"][i, :tl] = s["vec"][:tl]
        out["x_lengths"][i] = tl
        if with_spec:
            out["spec"][i, :sl] = s["spec"][:sl]
        out["spec_lengths"][i] = sl
        out["wav"][i, :wl] = s["wav"][:wl]
        out["wav_lengths"][i] = wl
        if reflect_tail and wl >= 2:
            k = min(reflect_tail, wav_pad_to - wl)
            # real continuation first (bucket-cap truncation: the source wav
            # extends past spec_pad*hop — the reference computes the spec from
            # the FULL wav before truncating frames, so the tail frames must
            # see the true samples, not a mirror at the cut)
            avail = min(k, len(s["wav"]) - wl)
            if avail > 0:
                out["wav"][i, wl:wl + avail] = s["wav"][wl:wl + avail]
            end = wl + max(avail, 0)
            kk = min(k - max(avail, 0), end - 1)
            if kk > 0:  # mirror at the true end of the source
                out["wav"][i, end:end + kk] = s["wav"][end - 2 - np.arange(kk)]
        out["emo"][i] = s["emo"]
        out["sid"][i] = s["sid"]
    if compact:
        import ml_dtypes
        out["wav"] = np.clip(np.rint(out["wav"] * 32767.0),
                             -32767, 32767).astype(np.int16)
        out["x"] = out["x"].astype(ml_dtypes.bfloat16)
        out["emo"] = out["emo"].astype(ml_dtypes.bfloat16)
    return out


def quantize_text_len(n: int, quantum: int = 32, cap: int = 384) -> int:
    return min(((n + quantum - 1) // quantum) * quantum, cap)


class Prefetcher:
    """Thread-pool batch producer (replaces torch DataLoader's 8 workers/rank,
    train.py:63): several batches build concurrently (wav decode + spectrogram
    release the GIL in numpy/native code) and are yielded in sampler order.

    Text padding is STATIC PER BUCKET (the max text length over the bucket's
    utterances, quantized) rather than per-batch-max: the jit shape count is
    bounded by the bucket count instead of the buckets × text-pads
    cross-product, which on the relay (30-200 s per compile) dominates
    first-epoch wall time.

    `transform` (host→host, e.g. numpy post-processing) runs inside the
    worker threads over the full depth+workers window. `place` (host→device,
    e.g. parallel.mesh.shard_batch) runs in a separate bounded stage that
    stays at most `place_depth` batches ahead of the consumer — device_put is
    async, so transfers still overlap the previous steps' compute, but only
    place_depth+1 batches ever sit staged in HBM (not the whole window)."""

    def __init__(self, dataset, sampler: BucketSampler, text_quantum: int = 32,
                 depth: int = 2, transform=None, workers: int = 8,
                 compact: bool = False, place=None, place_depth: int = 2):
        self.dataset = dataset
        self.sampler = sampler
        self.text_quantum = text_quantum
        self.depth = depth
        self.transform = transform
        self.workers = max(1, workers)
        self.compact = compact
        self.place = place
        self.place_depth = max(0, place_depth)
        self._bucket_text_pad = None

    def _text_pads(self):
        """bucket_idx -> static text pad (None when the dataset has no
        text-length metadata; collate then falls back to the batch max)."""
        if self._bucket_text_pad is None:
            tl = getattr(self.dataset, "text_lengths", None)
            pads = {}
            for bi, bucket in enumerate(self.sampler.buckets):
                if tl and bucket:
                    mx = max(tl[i] for i in bucket)
                    pads[bi] = max(quantize_text_len(mx, self.text_quantum,
                                                     self.dataset.max_text_len),
                                   self.text_quantum)
                else:
                    pads[bi] = None
            self._bucket_text_pad = pads
        return self._bucket_text_pad

    def _build(self, bi: int, idxs: List[int]):
        samples = [self.dataset[i] for i in idxs]
        text_pad = self._text_pads().get(bi)
        if text_pad is None:
            text_pad = max(quantize_text_len(max(s["vec"].shape[0] for s in samples),
                                             self.text_quantum, self.dataset.max_text_len),
                           self.text_quantum)
        spec_pad = self.sampler.bucket_upper_bound(bi)
        tail = 0 if getattr(self.dataset, "load_spec", True) \
            else self.dataset.filter_length
        b = collate(samples, text_pad, spec_pad, self.dataset.hop_length,
                    reflect_tail=tail, compact=self.compact)
        if self.transform is not None:
            b = self.transform(b)
        return b

    def _host_stream(self, start_epoch: int, end_epoch: int):
        import itertools
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        def tasks():
            for epoch in range(start_epoch, end_epoch + 1):
                for bi, idxs in self.sampler.epoch_batches(epoch):
                    yield epoch, bi, idxs

        window = self.depth + self.workers
        ex = ThreadPoolExecutor(max_workers=self.workers,
                                thread_name_prefix="vits-prefetch")
        try:
            pending = deque()
            it = tasks()
            for ep, bi, idxs in itertools.islice(it, window):
                pending.append((ep, ex.submit(self._build, bi, idxs)))
            for ep, bi, idxs in it:
                e0, fut = pending.popleft()
                yield e0, fut.result()
                pending.append((ep, ex.submit(self._build, bi, idxs)))
            while pending:
                e0, fut = pending.popleft()
                yield e0, fut.result()
        finally:
            ex.shutdown(wait=False, cancel_futures=True)

    def stream(self, start_epoch: int, end_epoch: int):
        """Yields (epoch, batch) continuously from start_epoch through
        end_epoch with ONE persistent worker pool: the collate + placement
        window stays full across epoch boundaries instead of draining and
        restarting cold every epoch (with short benchmark corpora that drain
        dominated input stall — an epoch was only a handful of batches).
        Batches are device-placed (bounded place_depth lookahead) when a
        placement callable was given, host numpy otherwise."""
        from collections import deque

        host = self._host_stream(start_epoch, end_epoch)
        if self.place is None:
            yield from host
            return
        placed = deque()
        for ep, b in host:
            placed.append((ep, self.place(b)))
            if len(placed) > self.place_depth:
                yield placed.popleft()
        while placed:
            yield placed.popleft()

    def epoch(self, epoch: int):
        """Yields collated batches for one epoch, in sampler order (the
        single-epoch view of `stream`)."""
        for _, b in self.stream(epoch, epoch):
            yield b
