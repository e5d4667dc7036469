"""Socket source → pipeline → socket sink — the reference's demo
(/root/reference/examples/sockets: StreamTextSocket reading lines from a
TCP server and writing results back out).  A loopback server feeds
lines through ``Sources.socket``; uppercased results go back over TCP
via ``Sinks.socket`` to a collector (a debug sink — each micro-batch is
driver-collected; see README "Known divergences").

Run: python examples/sockets.py
"""

import os
import socket as _socket
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hazelcast_jet_spark import get_spark
from hazelcast_jet_spark.sinks import Sinks
from hazelcast_jet_spark.sources import Sources

spark = get_spark("example-sockets")

# --- loopback infrastructure (stands in for external systems) ----------
feed = _socket.socket(_socket.AF_INET, _socket.SOCK_STREAM)
feed.setsockopt(_socket.SOL_SOCKET, _socket.SO_REUSEADDR, 1)
feed.bind(("127.0.0.1", 0)); feed.listen(1)
feed_port = feed.getsockname()[1]

sink_srv = _socket.socket(_socket.AF_INET, _socket.SOCK_STREAM)
sink_srv.setsockopt(_socket.SOL_SOCKET, _socket.SO_REUSEADDR, 1)
sink_srv.bind(("127.0.0.1", 0)); sink_srv.listen(4)
sink_port = sink_srv.getsockname()[1]
received: list[str] = []


def serve_feed():
    conn, _ = feed.accept()
    conn.sendall(b"tick one\ntick two\ntick three\n")
    time.sleep(4)            # keep open so a micro-batch drains
    conn.close()


def collect_sink():
    while True:
        try:
            conn, _ = sink_srv.accept()
        except OSError:
            return
        buf = b""
        while chunk := conn.recv(4096):
            buf += chunk
        received.extend(l for l in buf.decode().splitlines() if l)
        conn.close()


threading.Thread(target=serve_feed, daemon=True).start()
threading.Thread(target=collect_sink, daemon=True).start()

# --- the pipeline ------------------------------------------------------
lines = Sources.socket("127.0.0.1", feed_port)(spark)
shouted = lines.select(F.upper("value").alias("value"))
q = Sinks.socket("127.0.0.1", sink_port)(shouted)

deadline = time.time() + 30
while len(received) < 3 and time.time() < deadline:
    time.sleep(0.5)
q.stop()
sink_srv.close()
print("received over TCP:", sorted(received))
assert sorted(received) == ["TICK ONE", "TICK THREE", "TICK TWO"], received
