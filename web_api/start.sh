#!/bin/sh
# Start the serving stack (socket server + HTTP gateway + SAT API).
# Parity with the reference web_api/start.sh; pidfile-based process control.
cd "$(dirname "$0")"
RUN=run; mkdir -p "$RUN"
if [ ! -f "$RUN/socket_server.pid" ] || ! kill -0 "$(cat "$RUN/socket_server.pid" 2>/dev/null)" 2>/dev/null; then
  nohup python3 -m vits_tpu.serve.socket_server "$@" >> "$RUN/socket_server.log" 2>&1 &
  echo $! > "$RUN/socket_server.pid"
fi
if [ ! -f "$RUN/http_server.pid" ] || ! kill -0 "$(cat "$RUN/http_server.pid" 2>/dev/null)" 2>/dev/null; then
  nohup python3 -m vits_tpu.serve.http_server >> "$RUN/http_server.log" 2>&1 &
  echo $! > "$RUN/http_server.pid"
fi
if [ ! -f "$RUN/sat_api.pid" ] || ! kill -0 "$(cat "$RUN/sat_api.pid" 2>/dev/null)" 2>/dev/null; then
  nohup python3 -m vits_tpu.serve.sat_api >> "$RUN/sat_api.log" 2>&1 &
  echo $! > "$RUN/sat_api.pid"
fi
sh ./tlog.sh
echo "started."
