#!/bin/sh
# Serving load tests (parity: reference web_api/test/test.sh).
cd "$(dirname "$0")"
python3 load_test.py -n 5000 -t 10 --textfile test.txt "$@"
python3 load_test.py -n 5000 -t 12 --textfile test.txt "$@"
python3 load_test.py -n 5000 -t 20 --textfile test.txt "$@"
