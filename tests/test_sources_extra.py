"""Coverage for the thin source wrappers and the HTTP query interface:
ORC (TimeSeriesORC parity), socket streaming (AsyncTimeSeriesSocket
parity), and tools/serve.py (Interface.scala POST-query parity)."""

from __future__ import annotations

import json
import os
import socket
import socketserver
import subprocess
import sys
import threading
import time
import urllib.request

import numpy as np
import pandas as pd
import pytest

from modelardb_dynamic_spark.config import EngineConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG = EngineConfig(error_bound=0.0, sampling_interval_ms=100)


def _series_pdf(n=300):
    t = np.arange(n, dtype=np.int64) * 100 + 1000
    v = np.where(np.arange(n) % 60 < 30, 5.0, 9.0).astype(np.float32)
    return pd.DataFrame({"ts": t, "value": v})


def test_orc_source_matches_csv_source(spark, tmp_path):
    from modelardb_dynamic_spark.operators.compress import compress
    from modelardb_dynamic_spark.sources.readers import (
        series_from_csv,
        series_from_orc,
    )

    pdf = _series_pdf()
    orc_path = str(tmp_path / "series_orc")
    spark.createDataFrame(pdf).write.mode("overwrite").orc(orc_path)
    csv_path = str(tmp_path / "series.csv")
    pdf.to_csv(csv_path, index=False, header=True)

    s_orc = series_from_orc(spark, orc_path, sid="s1")
    s_csv = series_from_csv(
        spark, csv_path, sid="s1", header=True, ts_format="java"
    )
    segs_orc = sorted(
        tuple(r) for r in compress(s_orc, CFG).collect()
    )
    segs_csv = sorted(tuple(r) for r in compress(s_csv, CFG).collect())
    assert segs_orc == segs_csv and len(segs_orc) > 0


class _LineServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True


def test_socket_stream_source_feeds_segments(spark, tmp_path):
    """Socket lines -> streaming series -> micro-batch segments equals the
    batch compression of the same points."""
    from modelardb_dynamic_spark.sources.readers import (
        series_stream_from_socket,
    )

    pdf = _series_pdf(240)
    lines = [f"{r.ts},{r.value}\n" for r in pdf.itertuples(index=False)]
    ready = threading.Event()

    class Handler(socketserver.BaseRequestHandler):
        def handle(self):
            for ln in lines:
                self.request.sendall(ln.encode())
            ready.set()
            time.sleep(30)  # keep the connection open while Spark reads

    srv = _LineServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    thr = threading.Thread(target=srv.serve_forever, daemon=True)
    thr.start()
    try:
        stream = series_stream_from_socket(spark, "127.0.0.1", port, sid="s1")
        q = (
            stream.writeStream.format("memory")
            .queryName("sock_rows")
            .outputMode("append")
            .start()
        )
        try:
            deadline = time.time() + 60
            want = len(pdf)
            while time.time() < deadline:
                q.processAllAvailable()
                got = spark.sql("SELECT count(*) c FROM sock_rows").collect()[0]["c"]
                if got >= want:
                    break
                time.sleep(0.5)
            rows = spark.sql(
                "SELECT ts_ms, value FROM sock_rows ORDER BY ts_ms"
            ).collect()
            assert len(rows) == want
            assert [r["ts_ms"] for r in rows] == pdf["ts"].tolist()
            np.testing.assert_array_equal(
                np.array([r["value"] for r in rows], dtype=np.float32),
                pdf["value"].to_numpy(),
            )
        finally:
            q.stop()
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_interface_roundtrip(spark, tmp_path):
    """POST queries to tools/serve.py: plain SQL on the Segment view and
    the '#' / UDAF rewrite (COUNT_S) both return JSON rows."""
    from modelardb_dynamic_spark.operators.compress import compress
    from modelardb_dynamic_spark.sources.readers import series_from_parquet

    pdf = _series_pdf(200)
    src = str(tmp_path / "src_parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    series = series_from_parquet(spark, src, sid="s1")
    seg_path = str(tmp_path / "segments_parquet")
    compress(series, CFG).write.mode("overwrite").parquet(seg_path)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [
            sys.executable,
            os.path.join(REPO, "tools", "serve.py"),
            "--segments", seg_path,
            "--port", str(port),
            "--sampling-interval-ms", "100",
        ],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    try:
        deadline = time.time() + 120
        line = ""
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "listening" in line:
                break
        assert "listening" in line, "server never came up"

        def post(sql: str) -> dict:
            last: Exception | None = None
            for _ in range(5):  # the subprocess JVM can be slow under load
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}", data=sql.encode()
                )
                try:
                    with urllib.request.urlopen(req, timeout=120) as resp:
                        return json.loads(resp.read())
                except urllib.error.HTTPError as e:
                    return json.loads(e.read())
                except (urllib.error.URLError, TimeoutError, OSError) as e:
                    last = e
                    time.sleep(5)
            raise last

        body = post("SELECT COUNT_S(#) AS pts FROM Segment")
        assert body["rows"] == [{"pts": 200}]
        body = post(
            "SELECT sid, MIN_S(#) AS mn, MAX_S(#) AS mx FROM Segment GROUP BY sid"
        )
        assert body["rows"] == [{"sid": "s1", "mn": 5.0, "mx": 9.0}]
        body = post("SELECT broken syntax")
        assert "error" in body
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_iceberg_wiring_degrades_gracefully(spark):
    """No Iceberg jar in this sandbox: conf builder emits the documented
    catalog settings; create_warehouse refuses with a pointer to the
    parquet catalog instead of failing obscurely."""
    from modelardb_dynamic_spark.sources import iceberg

    conf = iceberg.iceberg_conf("/tmp/wh", catalog="c1")
    assert conf["spark.sql.catalog.c1.type"] == "hadoop"
    assert conf["spark.sql.catalog.c1.warehouse"] == "/tmp/wh"
    assert "iceberg-spark-runtime" in conf["spark.jars.packages"]
    assert iceberg.iceberg_available(spark) is False
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        iceberg.create_warehouse(spark)


def test_socket_interface_line_protocol(spark, tmp_path):
    """Interface.scala:48-88 raw-socket parity (closes a former non-goal):
    one query per line over TCP, JSON line back; an empty line answers
    'only SELECT is supported'; a non-SELECT line closes the connection."""
    from modelardb_dynamic_spark.operators.compress import compress
    from modelardb_dynamic_spark.sources.readers import series_from_parquet

    pdf = _series_pdf(200)
    src = str(tmp_path / "sock_src")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    series = series_from_parquet(spark, src, sid="s1")
    seg_path = str(tmp_path / "sock_segments")
    compress(series, CFG).write.mode("overwrite").parquet(seg_path)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [
            sys.executable, os.path.join(REPO, "tools", "serve.py"),
            "--segments", seg_path, "--port", str(port),
            "--interface", "socket", "--sampling-interval-ms", "100",
        ],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
        text=True,
    )
    try:
        deadline = time.time() + 120
        line = ""
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "listening" in line:
                break
        assert "listening" in line, "server never came up"
        conn = socket.create_connection(("127.0.0.1", port), timeout=120)
        f = conn.makefile("rw", encoding="utf-8")
        f.write("SELECT COUNT_S(#) AS pts FROM Segment\n")
        f.flush()
        body = json.loads(f.readline())
        assert body["rows"] == [{"pts": 200}]
        f.write("\n")  # empty line: the reference's quirky hint reply
        f.flush()
        assert f.readline().strip() == "only SELECT is supported"
        f.write("quit\n")  # any other non-empty line closes the connection
        f.flush()
        assert f.readline() == ""  # EOF: server closed its side
        conn.close()
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_http_interface_embedded_engine(spark, tmp_path):
    """serve.py --engine embedded: the same HTTP surface answered by the
    driver-local DuckDB engine (the reference's H2 deployment choice) —
    no Spark session in the server process, same segment files, same
    answers as the Spark-backed test above."""
    from modelardb_dynamic_spark.operators.compress import compress
    from modelardb_dynamic_spark.sources.readers import series_from_parquet

    pdf = _series_pdf(200)
    src = str(tmp_path / "src_parquet")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    series = series_from_parquet(spark, src, sid="s1")
    seg_path = str(tmp_path / "segments_parquet")
    compress(series, CFG).write.mode("overwrite").parquet(seg_path)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    proc = subprocess.Popen(
        [
            sys.executable,
            os.path.join(REPO, "tools", "serve.py"),
            "--segments", seg_path,
            "--port", str(port),
            "--engine", "embedded",
        ],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )
    try:
        deadline = time.time() + 60
        line = ""
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "listening" in line:
                break
        assert "listening" in line, "embedded server never came up"

        def post(sql: str) -> dict:
            last: Exception | None = None
            for _ in range(5):  # the box can stall under suite load
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}", data=sql.encode()
                )
                try:
                    with urllib.request.urlopen(req, timeout=60) as resp:
                        return json.loads(resp.read())
                except urllib.error.HTTPError as e:
                    return json.loads(e.read())
                except (urllib.error.URLError, TimeoutError, OSError) as e:
                    last = e
                    time.sleep(5)
            raise last

        body = post("SELECT COUNT_S(#) AS pts FROM Segment")
        assert body["rows"] == [{"pts": 200}]
        body = post(
            "SELECT sid, MIN_S(#) AS mn, MAX_S(#) AS mx FROM Segment GROUP BY sid"
        )
        assert body["rows"] == [{"sid": "s1", "mn": 5.0, "mx": 9.0}]
        # DataPoint view through the embedded two-phase scan
        body = post(
            "SELECT COUNT(*) AS n FROM DataPoint WHERE ts_ms >= 1000"
        )
        assert body["rows"] == [{"n": 200}]
        body = post("SELECT broken syntax")
        assert "error" in body
    finally:
        proc.terminate()
        proc.wait(timeout=30)


def test_query_file_batch_interface(spark, tmp_path):
    """Interface.scala's fourth surface (query-file batch, :169-185):
    one query per line, `--` comments skipped, one JSON line per query —
    driven through the embedded engine subprocess (same _execute as
    http/socket/repl)."""
    from modelardb_dynamic_spark.operators.compress import compress
    from modelardb_dynamic_spark.sources.readers import series_from_parquet

    pdf = _series_pdf(200)
    src = str(tmp_path / "qf_src")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    series = series_from_parquet(spark, src, sid="s1")
    seg_path = str(tmp_path / "qf_segments")
    compress(series, CFG).write.mode("overwrite").parquet(seg_path)

    qfile = tmp_path / "queries.sql"
    qfile.write_text(
        "-- comment lines are skipped\n"
        "\n"
        "SELECT COUNT_S(#) AS pts FROM Segment\n"
        "SELECT sid, MIN_S(#) AS mn, MAX_S(#) AS mx FROM Segment GROUP BY sid\n"
        "SELECT broken FROM nowhere\n"
    )
    out = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "serve.py"),
            "--segments", seg_path,
            "--engine", "embedded",
            "--interface", "file",
            "--query-file", str(qfile),
            "--sampling-interval-ms", "100",
        ],
        cwd=REPO, capture_output=True, text=True, check=True, timeout=120,
    )
    lines = [json.loads(x) for x in out.stdout.strip().splitlines()]
    assert len(lines) == 3
    assert lines[0]["rows"] == [{"pts": 200}]
    assert lines[1]["rows"] == [{"sid": "s1", "mn": 5.0, "mx": 9.0}]
    assert "error" in lines[2]
