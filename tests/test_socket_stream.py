"""Live socket-source streaming test (S12/T1-T3).

The reference's actual streaming entry point is a TCP socket of text
lines: `ssc.socketTextStream("0.0.0.0", 9999)` fed by the tweepy push
listener (Chapter 6 - Introduction to Spark Streaming.ipynb:56;
streaming/tweepy_stream.py:74-83). The other streaming tests use
file/rate/memory stand-ins; this one closes the loop with a REAL socket —
a local server thread plays the feeder, Spark's socket source connects to
it, and the same wordcount transform runs per micro-batch into a memory
sink (the pprint() analog).
"""

from __future__ import annotations

import socket
import threading
import time

from data_pipelines_course_spark.streaming.jobs import (
    socket_lines,
    wordcount_transform,
)

LINES = [
    "to be or not to be",
    "to be is to do",
]
# wordcount ground truth over LINES
EXPECTED = {"to": 4, "be": 3, "or": 1, "not": 1, "is": 1, "do": 1}


def test_socket_stream_wordcount(spark):
    server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    server.bind(("127.0.0.1", 0))
    server.listen(1)
    port = server.getsockname()[1]
    stop = threading.Event()

    def feeder():
        # the tweepy_stream.py role: accept Spark's connection, push lines,
        # hold the socket open until the assertion side is done (closing
        # early fails the streaming query).
        conn, _ = server.accept()
        try:
            for ln in LINES:
                conn.sendall((ln + "\n").encode())
            stop.wait(timeout=60)
        finally:
            conn.close()
            server.close()

    t = threading.Thread(target=feeder, daemon=True)
    t.start()

    stream = socket_lines(spark, host="127.0.0.1", port=port)
    assert stream.isStreaming
    query = (wordcount_transform(stream)
             .writeStream.format("memory").queryName("socket_wc")
             .outputMode("complete")
             .trigger(processingTime="1 second")
             .start())
    try:
        deadline = time.monotonic() + 60
        got = {}
        while time.monotonic() < deadline:
            got = {r["word"]: r["cnt"]
                   for r in spark.sql("SELECT * FROM socket_wc").collect()}
            if got == EXPECTED:
                break
            time.sleep(0.5)
        assert got == EXPECTED, f"socket wordcount never converged: {got}"
    finally:
        stop.set()
        query.stop()
