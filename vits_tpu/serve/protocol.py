"""Socket wire protocol + client.

Parity with the reference web_api/socket_{server,client}.py: 4-byte length
prefix + pickled request/response dicts over TCP. (The reference sizes frames
with sys.getsizeof — a Python-object-overhead quirk; we use exact byte
lengths, which is self-consistent between this client and server.)
"""

from __future__ import annotations

import pickle
import socket
import struct
from typing import Optional, Tuple


def send_msg(sock: socket.socket, obj) -> None:
    body = pickle.dumps(obj)
    sock.sendall(struct.pack("<i", len(body)))
    sock.sendall(body)


def recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def recv_msg(sock: socket.socket):
    header = sock.recv(4)
    if not header or len(header) < 4:
        return None
    (size,) = struct.unpack("<i", header)
    if size <= 0:
        return None
    return pickle.loads(recv_exact(sock, size))


def synthesize_stream(inputs: dict, remote: Tuple[str, int] = ("localhost", 5959),
                      timeout: float = 60):
    """Streaming client call: sends the request with `stream=True` and yields
    each framed response — PCM chunk dicts ({"pcm", "sr", "seq", ...}) followed
    by the final metadata dict ({"final": True, ...}). The connection is
    per-request (the server ends the stream with the final dict)."""
    sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    sock.settimeout(timeout)
    try:
        sock.connect(remote)
        send_msg(sock, {**inputs, "stream": True})
        while True:
            msg = recv_msg(sock)
            if msg is None:
                break
            yield msg
            if msg.get("final"):
                break
    finally:
        sock.close()


def synthesize(inputs: dict, remote: Tuple[str, int] = ("localhost", 5959),
               tcp_client_socket: Optional[socket.socket] = None,
               return_socket: bool = False):
    """Client call (web_api/socket_client.py:10-37): optionally keeps the
    connection alive for reuse."""
    outputs = None
    try:
        if tcp_client_socket is None:
            tcp_client_socket = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            tcp_client_socket.settimeout(60)
            tcp_client_socket.connect(remote)
        send_msg(tcp_client_socket, inputs)
        outputs = recv_msg(tcp_client_socket)
    except Exception as e:  # noqa: BLE001 — mirror reference robustness
        print("synthesize:: Exception:", e)
        outputs = None
    finally:
        if not return_socket or outputs is None:
            if tcp_client_socket is not None:
                tcp_client_socket.close()
            tcp_client_socket = None
    return (outputs, tcp_client_socket) if return_socket else outputs
