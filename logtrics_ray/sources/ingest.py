"""Push ingest edge — the live analog of the reference's UDP/TCP line
readers (/root/reference/reader/readers.go:109-196).

The reference tails sockets and feeds lines straight into the Lua
pipeline.  A batch engine's unit of replayable, resumable input is an
immutable shard FILE — so this daemon's single job is to turn the
former into the latter: listen on UDP and/or TCP for newline-delimited
log lines and rotate them into ``*.log`` shards in a spool directory
(write tmp -> flush -> ``os.replace``, so a concurrently-running reader
or ``watch`` loop never observes a partial shard).

The spool then feeds the SAME code path as any static log directory:

    read_log_lines(spool_dir) -> extract_points(..., text_column="text")

or continuously via the polling ``watch`` loop.  Deliberately an EDGE
process, not a Ray stage: a socket is single-host, ordered and
unreplayable, which is exactly what a distributed, retrying execution
model cannot consume directly — the shard file boundary is where
at-most-once socket delivery becomes idempotent, lineage-tracked input.

CLI: ``python -m logtrics_ray listen --spool /var/spool/lt --udp-port
5140 --tcp-port 5141``.
"""

from __future__ import annotations

import os
import socket
import threading
import time


class _Spool:
    """Thread-safe line buffer with atomic shard rotation."""

    def __init__(self, spool_dir: str, max_lines: int, max_age_s: float,
                 prefix: str):
        os.makedirs(spool_dir, exist_ok=True)
        self.dir = spool_dir
        self.max_lines = max_lines
        self.max_age_s = max_age_s
        self.prefix = prefix
        self._lines: list[str] = []
        self._first_ts: float | None = None
        self._seq = 0
        self._lock = threading.Lock()
        # resume an existing spool without clobbering prior shards
        for name in os.listdir(spool_dir):
            if name.startswith(prefix) and name.endswith(".log"):
                try:
                    self._seq = max(self._seq,
                                    int(name[len(prefix) + 1:-4]) + 1)
                except ValueError:
                    pass

    def add(self, lines: list[str]) -> None:
        if not lines:
            return
        with self._lock:
            if not self._lines:
                self._first_ts = time.monotonic()
            self._lines.extend(lines)
            if len(self._lines) >= self.max_lines:
                self._rotate_locked()

    def maybe_rotate_by_age(self) -> None:
        with self._lock:
            if (self._lines and self._first_ts is not None
                    and time.monotonic() - self._first_ts >= self.max_age_s):
                self._rotate_locked()

    def flush(self) -> None:
        with self._lock:
            if self._lines:
                self._rotate_locked()

    def _rotate_locked(self) -> None:
        name = f"{self.prefix}-{self._seq:08d}.log"
        self._seq += 1
        tmp = os.path.join(self.dir, "." + name + ".tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(self._lines))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.dir, name))
        self._lines = []
        self._first_ts = None


class LineIngestServer:
    """UDP + TCP newline-delimited line listener -> rotating ``*.log``
    shards.  Bind with port 0 for an ephemeral port (tests); the bound
    ports are returned by ``start()``.  ``stop()`` flushes the remainder
    so no accepted line is lost on shutdown."""

    def __init__(self, spool_dir: str, udp_port: int | None = None,
                 tcp_port: int | None = None, host: str = "127.0.0.1",
                 max_lines: int = 10_000, max_age_s: float = 5.0,
                 prefix: str = "ingest"):
        if udp_port is None and tcp_port is None:
            raise ValueError("at least one of udp_port / tcp_port required")
        self.spool = _Spool(spool_dir, max_lines, max_age_s, prefix)
        self.host = host
        self._udp_port, self._tcp_port = udp_port, tcp_port
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._udp_sock = self._tcp_sock = None

    # ------------------------------------------------------------ lifecycle
    def start(self) -> tuple[int | None, int | None]:
        if self._udp_port is not None:
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            s.bind((self.host, self._udp_port))
            s.settimeout(0.2)
            self._udp_sock, self._udp_port = s, s.getsockname()[1]
            self._spawn(self._udp_loop)
        if self._tcp_port is not None:
            s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            s.bind((self.host, self._tcp_port))
            s.listen(16)
            s.settimeout(0.2)
            self._tcp_sock, self._tcp_port = s, s.getsockname()[1]
            self._spawn(self._tcp_accept_loop)
        self._spawn(self._age_loop)
        return self._udp_port, self._tcp_port

    def stop(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=5.0)
        for s in (self._udp_sock, self._tcp_sock):
            if s is not None:
                s.close()
        self.spool.flush()

    def _spawn(self, fn) -> None:
        t = threading.Thread(target=fn, daemon=True)
        t.start()
        self._threads.append(t)

    # ------------------------------------------------------------ listeners
    def _udp_loop(self) -> None:
        while not self._stop.is_set():
            try:
                data, _ = self._udp_sock.recvfrom(65536)
            except socket.timeout:
                continue
            except OSError:
                break
            text = data.decode("utf-8", errors="replace")
            # reference readers TrimSpace each line (readers.go:140-141):
            # CRLF senders must not leave a stray \r in the series text
            self.spool.add([s for ln in text.split("\n")
                            if (s := ln.strip())])

    def _tcp_accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._tcp_sock.accept()
            except socket.timeout:
                continue
            except OSError:
                break
            self._spawn(lambda c=conn: self._tcp_conn_loop(c))

    def _tcp_conn_loop(self, conn: socket.socket) -> None:
        conn.settimeout(0.2)
        buf = b""
        with conn:
            while not self._stop.is_set():
                try:
                    chunk = conn.recv(65536)
                except socket.timeout:
                    continue
                except OSError:
                    break
                if not chunk:            # peer closed
                    break
                buf += chunk
                if b"\n" in buf:
                    *done, buf = buf.split(b"\n")
                    self.spool.add(
                        [s for d in done
                         if (s := d.decode("utf-8",
                                           errors="replace").strip())])
        if buf.strip():                  # trailing line without newline
            self.spool.add([buf.decode("utf-8", errors="replace").strip()])

    def _age_loop(self) -> None:
        while not self._stop.wait(0.1):
            self.spool.maybe_rotate_by_age()
