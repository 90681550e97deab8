"""TTS socket server.

Parity with the reference web_api/socket_server.py (TTServer:96-173): a TCP
listener serving length-prefixed pickle requests, N workers sharing one listen
socket, per-request `tts.update()` hot-reload, and RTF logging.

TPU adaptation: the reference runs one *process* per GPU×job, each owning a
model replica. A TPU chip is owned by exactly one process, so within a process
we run N handler *threads* sharing one model replica behind a lock (device
compute serializes on the chip anyway; threads overlap host-side frontend
work). Multi-chip hosts scale by launching one server process per chip on the
same port with SO_REUSEPORT (kernel load-balances accepts).
"""

from __future__ import annotations

import argparse
import os
import socket
import sys
import threading
import time
from typing import Optional


def strftime():
    return time.strftime("%Y-%m-%d %H:%M:%S")


def tts_worker(server_socket: socket.socket, tts, lock: threading.Lock,
               max_input_size: int, work: int, loglv: int = 0):
    from vits_tpu.serve.protocol import recv_exact, send_msg
    import pickle
    import struct

    func_name = f"tts_worker: work{work}(pid={os.getpid()})"
    while True:
        try:
            conn, addr = server_socket.accept()
        except OSError:
            break
        if loglv > 0:
            print(f"{strftime()} {func_name}, client connected {addr}")
        try:
            while True:
                header = conn.recv(4)
                if not header or len(header) < 4:
                    break
                (size,) = struct.unpack("<i", header)
                if size <= 0 or size > max_input_size:
                    print(f"{strftime()} {func_name}, refusing request size={size}")
                    break
                inputs = pickle.loads(recv_exact(conn, size))
                t0 = time.time()
                if inputs.get("stream"):
                    # streaming mode (north-star config 5): one framed pickle
                    # per PCM chunk, terminated by the final metadata dict
                    # ({"final": True, ...}) — see VITSWrap.speaking_stream.
                    outputs = None
                    with lock:
                        for outputs in tts.speaking_stream(inputs):
                            send_msg(conn, outputs)
                        tts.update()
                else:
                    with lock:
                        outputs = tts.speaking(inputs)
                        tts.update()
                    send_msg(conn, outputs)
                if loglv > 0:
                    rtf = (outputs or {}).get("rtf", 1.0)
                    print(f"{strftime()} {func_name}, served {addr} in "
                          f"{time.time()-t0:.3f}s rtf={rtf:.3f}")
        except Exception as e:  # noqa: BLE001
            print(f"{strftime()} {func_name}, Exception: {e}")
        finally:
            conn.close()


class TTServer:
    def __init__(self, host="127.0.0.1", port=5959, num_workers=1,
                 max_input_size=100 * 1024, ckpt_path: Optional[str] = None,
                 loglv=0, reuse_port=False, tts=None):
        self.host = host
        self.port = port
        self.num_workers = num_workers
        self.max_input_size = max_input_size
        self.ckpt_path = ckpt_path
        self.loglv = loglv
        self.reuse_port = reuse_port
        self._tts = tts
        self._sock: Optional[socket.socket] = None
        self._threads = []

    def start(self):
        """Bind + spawn worker threads; returns the bound port."""
        if self._tts is None:
            from vits_tpu.vits_wrap import VITSWrap
            print(f"{strftime()} TTServer: loading tts model ...")
            self._tts = VITSWrap(self.ckpt_path, loglv=self.loglv)
            print(f"{strftime()} TTServer: model loaded, ckpt root="
                  f"{self._tts.speecher.res_root_path}")
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        if self.reuse_port and hasattr(socket, "SO_REUSEPORT"):
            s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEPORT, 1)
        s.bind((self.host, self.port))
        s.listen(16)
        self._sock = s
        self.port = s.getsockname()[1]
        lock = threading.Lock()
        for work in range(self.num_workers):
            t = threading.Thread(
                target=tts_worker,
                args=(s, self._tts, lock, self.max_input_size, work, self.loglv),
                daemon=True)
            t.start()
            self._threads.append(t)
        return self.port

    def run(self):
        self.start()
        try:
            for t in self._threads:
                t.join()
        finally:
            self.stop()

    def stop(self):
        if self._sock is not None:
            self._sock.close()
            self._sock = None


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=5959)
    parser.add_argument("--n-jobs", "-j", type=int, default=1,
                        help="handler threads sharing the chip replica")
    parser.add_argument("--max-input", "-m", type=int, default=100 * 1024)
    parser.add_argument("--checkpoint", "-c", type=str, default=None)
    parser.add_argument("--reuse-port", action="store_true",
                        help="SO_REUSEPORT for one-process-per-chip scaling")
    parser.add_argument("--loglv", "-d", type=int, default=0)
    args = parser.parse_args(argv)
    TTServer(args.host, args.port, args.n_jobs, args.max_input,
             args.checkpoint, args.loglv, args.reuse_port).run()


if __name__ == "__main__":
    main()
