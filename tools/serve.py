#!/usr/bin/env python
"""Minimal HTTP query endpoint — Interface.scala parity (:32-45 HTTP POST
on :9999, responses as JSON rows with wall time, :153-166).

    python tools/serve.py --segments /path/to/segments.parquet --port 9999
    curl -d "SELECT sid, AVG_S(#) AS avg_s FROM Segment GROUP BY sid" :9999

The engine applies the reference's '#'/UDAF rewrites (COUNT_S/MIN_S/MAX_S/
SUM_S/AVG_S) before handing the query to Spark SQL.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--segments", required=True, help="segment table parquet path")
    ap.add_argument("--port", type=int, default=9999)
    ap.add_argument(
        "--host",
        default="127.0.0.1",
        help="bind address; the endpoint executes Spark SQL, so expose "
        "beyond localhost (e.g. 0.0.0.0) only deliberately",
    )
    ap.add_argument("--error-bound", type=float, default=10.0)
    ap.add_argument("--sampling-interval-ms", type=int, default=60_000)
    args = ap.parse_args()

    from modelardb_dynamic_spark.config import EngineConfig
    from modelardb_dynamic_spark.engine import ModelarEngine
    from modelardb_dynamic_spark.session import build_session

    spark = build_session("modelardb_dynamic_spark-serve")
    engine = ModelarEngine(
        spark,
        spark.read.parquet(args.segments),
        EngineConfig(
            error_bound=args.error_bound,
            sampling_interval_ms=args.sampling_interval_ms,
        ),
    )
    engine.register_views()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 (stdlib naming)
            length = int(self.headers.get("Content-Length", 0))
            query = self.rfile.read(length).decode()
            t0 = time.time()
            try:
                rows = [r.asDict(recursive=True) for r in engine.sql(query).collect()]
                body = {
                    "time_ms": round((time.time() - t0) * 1000, 1),
                    "rows": rows,
                }
                code = 200
            except Exception as e:  # surface analysis errors to the client
                body = {"error": str(e).split("\n")[0]}
                code = 400
            payload = json.dumps(body, default=str).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):  # quiet
            pass

    print(f"listening on {args.host}:{args.port}", flush=True)
    HTTPServer((args.host, args.port), Handler).serve_forever()


if __name__ == "__main__":
    main()
