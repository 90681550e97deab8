#!/usr/bin/env python3
"""HTTP serving load test.

Parity with the reference web_api/test/test_tts.py + test.sh: a thread pool
hammers GET /api/text2speech with N requests × M threads and reports wall
time, request rate, and synthesized-audio throughput.
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import time
import urllib.parse
import urllib.request


def one_request(base, text, per):
    q = urllib.parse.urlencode({"tex": text, "per": per})
    t0 = time.time()
    with urllib.request.urlopen(f"{base}/api/text2speech?{q}", timeout=120) as r:
        body = r.read()
    ok = body[:4] == b"RIFF"
    return ok, time.time() - t0, len(body)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--base", type=str, default="http://127.0.0.1:6767")
    parser.add_argument("--requests", "-n", type=int, default=100)
    parser.add_argument("--threads", "-t", type=int, default=10)
    parser.add_argument("--text", type=str, default="这是一个用于压力测试的句子。")
    parser.add_argument("--textfile", type=str, default=None)
    parser.add_argument("--spkid", type=int, default=1)
    args = parser.parse_args(argv)

    texts = [args.text]
    if args.textfile:
        with open(args.textfile) as f:
            texts = [l.strip() for l in f if l.strip()]

    t0 = time.time()
    results = []
    with cf.ThreadPoolExecutor(max_workers=args.threads) as ex:
        futs = [ex.submit(one_request, args.base, texts[i % len(texts)], args.spkid)
                for i in range(args.requests)]
        for f in cf.as_completed(futs):
            results.append(f.result())
    wall = time.time() - t0
    ok = sum(1 for r in results if r[0])
    lat = sorted(r[1] for r in results)
    byte_total = sum(r[2] for r in results)
    print(f"requests={len(results)} ok={ok} wall={wall:.2f}s "
          f"rps={len(results)/wall:.2f} "
          f"p50={lat[len(lat)//2]*1000:.0f}ms p95={lat[int(len(lat)*0.95)]*1000:.0f}ms "
          f"audio_bytes={byte_total}")


if __name__ == "__main__":
    main()
