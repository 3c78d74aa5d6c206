"""RESP2 protocol conformance + Redis latest-KV sink parity.

Pins the wire protocol subset (sinks_redis): RESP2 framing both ways,
pipelining, SET/GET/DEL/EXISTS/KEYS/DBSIZE/FLUSHDB semantics, and the
sink contract — per-batch latest reduction + ordered-batch apply lands
exactly the batch latest-state, idempotent under batch redelivery.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from cdc_debezium_spark.operators import cdc
from cdc_debezium_spark.sinks_redis import (
    RedisLatestKvSink,
    RedisRespServer,
    RespClient,
)


def test_resp_protocol_roundtrip():
    with RedisRespServer() as srv:
        c = RespClient(srv.host, srv.port)
        assert c.execute(b"PING") == "PONG"
        assert c.execute(b"SET", b"k1", b"v1") == "OK"
        assert c.execute(b"GET", b"k1") == b"v1"
        assert c.execute(b"GET", b"nope") is None
        assert c.execute(b"EXISTS", b"k1", b"nope") == 1
        # pipelining: one write, N replies, order preserved
        replies = c.pipeline(
            [[b"SET", b"k2", b"v2"], [b"DEL", b"k1"], [b"DBSIZE"], [b"KEYS", b"*"]]
        )
        assert replies == ["OK", 1, 1, [b"k2"]]
        assert c.execute(b"FLUSHDB") == "OK"
        assert c.execute(b"DBSIZE") == 0
        c.close()


def test_resp_binary_safe_values():
    """Bulk strings are length-prefixed — values containing \\r\\n or
    RESP marker bytes must survive untouched."""
    with RedisRespServer() as srv:
        c = RespClient(srv.host, srv.port)
        evil = b"*2\r\n$3\r\nGET\r\n+OK\r\n:17\r\n"
        assert c.execute(b"SET", b"bin", evil) == "OK"
        assert c.execute(b"GET", b"bin") == evil
        c.close()


def test_redis_sink_ordered_batches_parity_and_idempotence(spark, sf_dir):
    """Three ordered chunks through the sink == batch latest-state
    (deletes absent); replaying the final chunk (at-least-once batch
    redelivery) changes nothing."""
    srv = RedisRespServer()
    try:
        sink = RedisLatestKvSink(srv.host, srv.port)
        ce = cdc.cdc_events(spark, sf_dir).select("pk", "ord2", "ts_us", "op", "val")
        hi = ce.agg(F.max("ord2")).first()[0] + 1
        cuts = [0, hi // 3, 2 * hi // 3, hi]
        chunks = [
            ce.where((F.col("ord2") >= cuts[i]) & (F.col("ord2") < cuts[i + 1]))
            for i in range(3)
        ]
        for chnk in chunks:
            sink(chnk)

        def state():
            c = RespClient(srv.host, srv.port)
            keys = c.execute(b"KEYS", b"*")
            vals = c.pipeline([[b"GET", k] for k in keys]) if keys else []
            c.close()
            out = {}
            for k, v in zip(keys, vals):
                d = json.loads(v)
                out[int(k.decode().split(":", 1)[1])] = (d["ts_us"], d["val"])
            return out

        got = state()
        want = {
            r["pk"]: (r["ts_us"], r["val"])
            for r in cdc.latest_state(cdc.cdc_events(spark, sf_dir))
            .select("pk", "ts_us", "val")
            .collect()
        }
        assert got == want
        sink(chunks[-1])  # redeliver the tail batch
        assert state() == want
    finally:
        srv.close()
