"""Golden test: the long-text splitter (vits_tpu.vits_wrap.split_long_text,
an original table-driven implementation) must segment exactly like the
reference VITSWrap._split_utt_text (vits_wrap.py:101-166) — same pieces, same
ids — over long mixed CJK/ASCII corpora including digit-adjacent ./,/: cases
(decimals, clock times, thousand groups) and double-width ——/…… separators.
"""

import os
import sys
import types

import pytest

REF = "/root/reference/emotional-vits"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_split():
    """Bind the reference splitter without constructing the full torch
    pipeline: import its module with the heavyweight deps stubbed, then call
    the unbound method on a shim carrying max_utt_length."""
    stubbed = []
    for name in ("textparser", "infer", "version", "librosa"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.TextParser = object
            mod.EmoVITS = object
            mod.__version__ = "0"
            mod.resample = lambda *a, **k: None
            sys.modules[name] = mod
            stubbed.append(name)
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib
    try:
        ref_mod = importlib.import_module("vits_wrap")
    finally:
        # don't leak the stubs: other tests probe `import textparser` to pick
        # the real frontend vs the hash fallback
        for name in stubbed:
            sys.modules.pop(name, None)

    def split(utt_id, text, max_utt_length=64):
        shim = types.SimpleNamespace(max_utt_length=max_utt_length)
        return ref_mod.VITSWrap._split_utt_text(shim, utt_id, text)

    return split


CJK = "今天天气真好我们一起去公园散步吧外面阳光明媚微风不燥正是出游的好时节"
CORPUS = [
    "",
    "   ",
    "短句。",
    "x" * 63,
    "x" * 64,
    "x" * 65,
    # plain long CJK with strong punctuation at various offsets
    "。".join([CJK[:7], CJK[:19], CJK[:31], CJK[:11], CJK[:26], CJK]) + "。",
    "，".join([CJK[:13]] * 12),
    # mixed CJK/ASCII with ASCII sentence punctuation
    ("The quick brown fox jumps over the lazy dog. " * 6).strip(),
    "Hello, world! " + CJK + "? Yes; indeed: quite so. " + CJK + "!",
    # digit-adjacent ./,/: must not be cut (guard cases)
    "圆周率是3.14159265358979323846而自然对数的底是2.71828182845904523536大家都背过吗没有背过",
    "会议定于10:30开始12:45结束请大家准时参加并提前调试好设备不要迟到否则影响进度",
    "价格是1,234,567.89元而去年同期只有987,654.32元增长明显大家务必注意数字的精确性不得四舍五入",
    "version 2.5.1 was released on 2024.03.15, see notes: item 1, item 2, item 3, and more follow-ups",
    # digit on one side only (cut allowed)
    "他得了100. 分数公布之后大家都很惊讶因为满分只有一百分这显然是个错误需要复核一下成绩单才行",
    # double-width separators
    CJK + "——" + CJK + "……" + CJK,
    "x" * 39 + "——" + CJK + CJK,   # straddles the anchor exactly
    "x" * 38 + "——" + CJK + CJK,
    "x" * 63 + "……" + "y" * 40,    # forward 2-char hit at the window edge
    # bracket tier and weak tier
    CJK + "（插入语）" + CJK + "【注】" + CJK,
    CJK + "~" + CJK + " " + CJK + "\t" + CJK,
    # no separators at all: hard cuts
    "字" * 200,
    "z" * 200,
    # separators only before/after anchor
    "a" * 50 + "。" + "b" * 50,
    "。" + "a" * 120,
    # long ASCII with spaces only
    " ".join(["word"] * 40),
]


@pytest.mark.parametrize("max_len", [64, 32, 100])
def test_split_matches_reference(ref_split, max_len):
    from vits_tpu.vits_wrap import split_long_text
    for text in CORPUS:
        want_ids, want_texts = ref_split("utt", text, max_len)
        got_texts = split_long_text(text, max_len)
        got_ids = ["utt"] if len(got_texts) == 1 else [
            f"utt-{k}" for k in range(len(got_texts))]
        assert got_texts == want_texts, (max_len, text, got_texts, want_texts)
        assert got_ids == want_ids, (max_len, text)


def test_wrap_method_delegates(ref_split):
    """VITSWrap._split_utt_text (the method the pipeline calls) produces the
    same segmentation via the shared helper."""
    from vits_tpu.vits_wrap import VITSWrap
    shim = types.SimpleNamespace(max_utt_length=64)
    for text in CORPUS:
        want = ref_split("id7", text, 64)
        got = VITSWrap._split_utt_text(shim, "id7", text)
        assert got == tuple(want) or list(got) == list(want), (text, got, want)
