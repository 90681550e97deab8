"""mrk2lab markup conversion behaviors."""
from vits_tpu.toolkits.mrk2lab import convert_line, normalize_pinyin_stream


def test_basic_chinese_line():
    lab, err = convert_line("utt1.wav 你好/v 世界/n 。/w|ni3 hao3 shi4 jie4")
    assert err is None
    assert lab == "utt1 你好/ni3-hao3;v;CN;;; 世界/shi4-jie4;n;CN;;; 。/sil0;w;CN;;;"


def test_tone6_mapped_to_2():
    lab, err = convert_line("u 吗/y|ma6")
    assert err is None
    assert "吗/ma2;y;CN;;;" in lab


def test_english_bracket_word():
    lab, err = convert_line("u hello/n ，/w|[ha_lou2]")
    assert err is None
    # tone 2 -> 1, POS forced to nx, lang EN
    assert "hello/ha_lou1;nx;EN;;;" in lab
    assert "，/sil0;w;CN;;;" in lab


def test_erhua_merges_into_previous():
    lab, err = convert_line("u 花/n 儿/n|huar1")
    assert err is None
    assert "花儿/huar1;n;CN;;;" in lab


def test_silent_english_clitic():
    lab, err = convert_line("u it/n 's/u|[it2]")
    assert err is None
    assert "'s/;nx;EN;;;" in lab


def test_errors_reported_not_raised():
    lab, err = convert_line("u 你好/zz|ni3 hao3")
    assert lab is None and "unknown POS" in err
    lab, err = convert_line("u 你好/v|ni3 hao3 duo1")
    assert lab is None and "unconsumed" in err
    lab, err = convert_line("garbage-without-separator")
    assert lab is None and err


def test_pinyin_stream_normalization():
    toks = normalize_pinyin_stream("ni3hao3 * [ha lou2] shi4")
    assert "ni3" in " ".join(toks) or toks  # digits split syllables
    assert any("[" in t for t in toks)
