#!/bin/sh
# curl examples for the HTTP + SAT APIs (parity: reference web_api/test/client.sh).
BASE=${BASE:-http://127.0.0.1:6767}
SAT=${SAT:-http://127.0.0.1:6768}

# text2speech GET
curl -s "$BASE/api/text2speech?tex=%E4%BD%A0%E5%A5%BD&per=1&vol=100&spd=0&pit=0&emo=0" -o out.wav && echo "GET -> out.wav"

# text2speech POST
curl -s -X POST "$BASE/api/text2speech" -H 'Content-Type: application/json' \
  -d '{"tex": "你好，世界。", "per": 1, "vol": 100, "spd": 0, "pit": 0, "emo": 0}' -o out_post.wav && echo "POST -> out_post.wav"

# SAT: upload a recording + transcript for a new speaker (>=10000)
curl -s -X POST "$SAT/api/sat/uploadfile/10001" -F "file=@sample.wav" -F "text=你好世界" ; echo
# expected: {"code": 200, "data": {}, "msg": "save file ok!"}

curl -s "$SAT/api/sat/spkinfo" ; echo          # {"code":200,"data":{"10001":1},...}
curl -s "$SAT/api/sat/start" ; echo            # start adapt training
curl -s "$SAT/api/sat/status" ; echo           # 201 training / 200 success / 202 failure
curl -s "$SAT/api/sat/stop" ; echo             # stop + restart tts
curl -s "$SAT/api/sat/clean/10001" ; echo      # remove uploaded data
curl -s "$SAT/api/sat/start/tts" ; echo        # (re)start serving
