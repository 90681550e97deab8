"""SAT (speaker-adaptive training) management REST API.

Parity with the reference web_api/sat.py (34-260): upload wav+transcript per
new speaker (spkid >= 10000), clean, spkinfo, start/stop/status of adapt
training, and TTS restart — same routes and JSON shapes
({"code", "data", "msg"}).

Process control deviates deliberately: the reference shells out to ps|grep
pattern matching (sat.py:105-183) which can match unrelated processes; here
every managed process records a pidfile and is signalled by exact PID.
Implemented on stdlib ThreadingHTTPServer (no FastAPI in the image).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import signal
import subprocess
import threading
import time
import urllib.parse
from email.parser import BytesParser
from email.policy import default as email_default_policy
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

SAT_DIR = None
OUT_DIR = None
RUN_DIR = None  # pidfiles + logs
_sat_thread = None
_sat_stop_flag = threading.Event()


def _pidfile(name):
    return os.path.join(RUN_DIR, f"{name}.pid")


def _read_pid(name):
    try:
        with open(_pidfile(name)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def _alive(pid):
    if pid is None:
        return False
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


def _spawn(name, argv, cwd=None):
    log = open(os.path.join(RUN_DIR, f"{name}.log"), "ab")
    p = subprocess.Popen(argv, cwd=cwd, stdout=log, stderr=log,
                         start_new_session=True)
    with open(_pidfile(name), "w") as f:
        f.write(str(p.pid))
    return p.pid


def _kill(name, timeout=10.0):
    pid = _read_pid(name)
    if pid is None:
        return
    try:
        os.killpg(os.getpgid(pid), signal.SIGTERM)
    except OSError:
        pass
    t0 = time.time()
    while _alive(pid) and time.time() - t0 < timeout:
        time.sleep(0.2)
    if _alive(pid):
        try:
            os.killpg(os.getpgid(pid), signal.SIGKILL)
        except OSError:
            pass
    try:
        os.remove(_pidfile(name))
    except OSError:
        pass


def has_tts():
    return _alive(_read_pid("socket_server")) or _alive(_read_pid("http_server"))


def stop_tts():
    _kill("http_server")
    _kill("socket_server")


def start_tts():
    ckpt1 = os.path.join(OUT_DIR, "checkpoint.npz")
    ckpt2 = os.path.join(SAT_DIR, "pretrain", "G_0.npz")
    if not os.path.exists(ckpt1) and os.path.exists(ckpt2):
        conf2 = os.path.join(SAT_DIR, "configs", "adapt.json")
        os.makedirs(OUT_DIR, exist_ok=True)
        shutil.copyfile(ckpt2, ckpt1)
        shutil.copyfile(conf2, os.path.join(OUT_DIR, "config.json"))
    if not _alive(_read_pid("socket_server")):
        _spawn("socket_server",
               ["python3", "-m", "vits_tpu.serve.socket_server",
                "--checkpoint", os.path.join(OUT_DIR, "checkpoint.npz")])
    if not _alive(_read_pid("http_server")):
        _spawn("http_server", ["python3", "-m", "vits_tpu.serve.http_server"])


def has_sat():
    global _sat_thread
    if _sat_thread is not None and _sat_thread.is_alive():
        return True
    _sat_thread = None
    return _alive(_read_pid("sat_adapt"))


def _sat_worker():
    """Stop TTS (frees the chip), run adapt as a child process, restart TTS."""
    was_tts = has_tts()
    if was_tts:
        stop_tts()
    try:
        _spawn("sat_adapt",
               ["python3", "-c",
                "import vits_tpu.sat as s; s.run_adapt(%r, %r)" % (SAT_DIR, OUT_DIR)])
        pid = _read_pid("sat_adapt")
        while _alive(pid) and not _sat_stop_flag.is_set():
            time.sleep(1.0)
        if _sat_stop_flag.is_set():
            _kill("sat_adapt")
    finally:
        try:
            os.remove(_pidfile("sat_adapt"))
        except OSError:
            pass
        if was_tts:
            start_tts()


class Handler(BaseHTTPRequestHandler):
    def _json(self, code, data=None, msg="", status=None):
        body = json.dumps({"code": code, "data": data or {}, "msg": msg}).encode()
        self.send_response(status or (200 if code < 400 else 400))
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    # --- handlers ---
    def _upload(self, spkid):
        if spkid < 10000:
            return self._json(400, msg=f"error: spkid={spkid} must more than 10000")
        length = int(self.headers.get("Content-Length", 0))
        ctype = self.headers.get("Content-Type", "")
        raw = self.rfile.read(length)
        msg = BytesParser(policy=email_default_policy).parsebytes(
            b"Content-Type: " + ctype.encode() + b"\r\n\r\n" + raw)
        filename, file_data, text = None, None, None
        for part in msg.iter_parts():
            name = part.get_param("name", header="content-disposition")
            if name == "file":
                filename = part.get_filename()
                file_data = part.get_payload(decode=True)
            elif name == "text":
                text = part.get_payload(decode=True).decode("utf-8").strip()
        if not filename or file_data is None or text is None:
            return self._json(400, msg="error: need multipart `file` and `text`")
        data_dir = os.path.join(SAT_DIR, "data", str(spkid))
        os.makedirs(data_dir, exist_ok=True)
        with open(os.path.join(data_dir, filename), "wb") as f:
            f.write(file_data)
        with open(os.path.join(data_dir, filename.replace(".wav", ".txt")),
                  "wt", encoding="utf-8") as f:
            f.write(text + "\n")
        return self._json(200, msg="save file ok!")

    def _clean(self, spkid):
        data_dir = os.path.join(SAT_DIR, "data", str(spkid))
        if not os.path.exists(data_dir):
            return self._json(400, msg=f"error: there is no any data for spkid={spkid}")
        if has_sat():
            return self._json(400, msg="error: sat is training")
        shutil.rmtree(data_dir, ignore_errors=True)
        return self._json(200, msg=f"sat clean success, spkid={spkid}")

    def _spkinfo(self):
        data_dir = os.path.join(SAT_DIR, "data")
        spkid = {}
        if os.path.exists(data_dir):
            for spkdir in glob.glob(f"{data_dir}/*"):
                sid = os.path.basename(spkdir)
                if os.path.isdir(spkdir) and sid.isdigit():
                    spkid[sid] = len(glob.glob(spkdir + "/*.wav"))
        if not spkid:
            return self._json(400, msg="error: there is no any speaker record data")
        return self._json(200, data=spkid, msg=f"sat speaker number={len(spkid)}")

    def _start(self):
        global _sat_thread
        if has_sat():
            return self._json(400, msg="error: sat is training")
        _sat_stop_flag.clear()
        _sat_thread = threading.Thread(target=_sat_worker, daemon=True)
        _sat_thread.start()
        return self._json(200, msg="sat start training success!")

    def _stop(self):
        _sat_stop_flag.set()
        _kill("sat_adapt")
        start_tts()
        return self._json(200, msg="sat stop training success!")

    def _status(self):
        if has_sat():
            return self._json(201, msg="sat is training!", status=200)
        ckpt = os.path.join(OUT_DIR, "checkpoint.npz")
        data_dir = os.path.join(SAT_DIR, "data")
        spkid1 = sorted(os.path.basename(d) for d in glob.glob(f"{data_dir}/*"))
        spkid2 = sorted(os.path.splitext(os.path.basename(p))[0]
                        for p in glob.glob(f"{OUT_DIR}/*.emo"))
        if not os.path.exists(ckpt) or any(x not in spkid2 for x in spkid1):
            return self._json(202, msg="sat training failure!", status=200)
        return self._json(200, msg="sat training success!")

    def _start_tts(self):
        if has_sat():
            return self._json(400, msg="error: sat is training!")
        start_tts()
        if has_tts():
            return self._json(200, msg="start tts success!")
        return self._json(400, msg="error: start tts failure!")

    def _route(self):
        path = urllib.parse.urlparse(self.path).path
        parts = [p for p in path.split("/") if p]
        if parts[:2] != ["api", "sat"]:
            return self._json(404, msg="not found", status=404)
        rest = parts[2:]
        if rest[:1] == ["uploadfile"] and len(rest) == 2 and self.command == "POST":
            return self._upload(int(rest[1]))
        if rest[:1] == ["clean"] and len(rest) == 2:
            return self._clean(int(rest[1]))
        if rest == ["spkinfo"]:
            return self._spkinfo()
        if rest == ["start"]:
            return self._start()
        if rest == ["stop"]:
            return self._stop()
        if rest == ["status"]:
            return self._status()
        if rest == ["start", "tts"]:
            return self._start_tts()
        return self._json(404, msg="not found", status=404)

    def do_GET(self):
        self._route()

    def do_POST(self):
        self._route()

    def log_message(self, fmt, *args):
        pass


def serve(host="0.0.0.0", port=6768, sat_dir=None, out_dir=None, run_dir=None):
    global SAT_DIR, OUT_DIR, RUN_DIR
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    SAT_DIR = os.path.abspath(sat_dir or os.path.join(repo, "sat"))
    OUT_DIR = os.path.abspath(out_dir or os.path.join(repo, "checkpoint"))
    RUN_DIR = os.path.abspath(run_dir or os.path.join(repo, "web_api", "run"))
    os.makedirs(RUN_DIR, exist_ok=True)
    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=6768)
    parser.add_argument("--sat-dir", type=str, default=None)
    parser.add_argument("--out-dir", type=str, default=None)
    args = parser.parse_args(argv)
    httpd = serve(args.host, args.port, args.sat_dir, args.out_dir)
    print(f"sat api on {args.host}:{args.port} (sat={SAT_DIR} out={OUT_DIR})")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
