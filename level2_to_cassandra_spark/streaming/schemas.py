"""Wire-format schemas — the serde structs of the reference as explicit
Spark StructTypes (never inferred on a stream; SURVEY.md §1.3).

Reference shapes (/root/reference/src/main.rs):

* envelope: ZMQ multipart — frame 0 topic, frame 1 msg type tag
  (``BOOK``/``TICK``), frame 2 JSON payload (main.rs:220-222);
* BookData (main.rs:40-48): one price level; a BOOK payload is a JSON
  ARRAY of these (a full snapshot per message, main.rs:77);
* TickData (main.rs:50-60): a single JSON object per message.

``time`` is epoch SECONDS on the wire (proven by
``Duration::from_secs``, main.rs:109) — the reference binds the raw
i64 to a CQL timestamp (ms) column, storing values off by 1000×; we
convert properly instead (SURVEY.md §1.4 quirk 1).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Columns every ingested message carries (Kafka: key/topic/value map
#: onto these; test sources build them directly).
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("msg_type", T.StringType(), True),
        T.StructField("payload", T.StringType(), True),
    ]
)

#: BookData — main.rs:40-48; JSON key "type" → column order_type
#: (serde rename, main.rs:46-47).
BOOK_LEVEL_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("time", T.LongType(), True),  # epoch seconds
        T.StructField("volume", T.IntegerType(), True),
        T.StructField("type", T.StringType(), True),
    ]
)

#: A BOOK payload: array of levels (Vec<BookData>, main.rs:77).
BOOK_PAYLOAD_SCHEMA = T.ArrayType(BOOK_LEVEL_SCHEMA)

#: TickData — main.rs:50-60.
TICK_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType(), True),
        T.StructField("bid", T.DoubleType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("ask", T.DoubleType(), True),
        T.StructField("time", T.LongType(), True),  # epoch seconds
        T.StructField("volume", T.IntegerType(), True),
        T.StructField("type", T.StringType(), True),  # "B" | "S"
    ]
)

#: Sink schema of {topic}_book tables (main.rs:80-92), post-transform.
BOOK_ROW_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("symbol", T.StringType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("time", T.TimestampType(), True),
        T.StructField("volume", T.IntegerType(), True),
        T.StructField("order_type", T.StringType(), True),
    ]
)

#: Sink schema of {topic}_tick tables incl. derived cum columns
#: (main.rs:133-152: "cumbuy int, cumsell int, cumdelta int").
TICK_ROW_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType(), False),
        T.StructField("symbol", T.StringType(), True),
        T.StructField("bid", T.DoubleType(), True),
        T.StructField("price", T.DoubleType(), True),
        T.StructField("ask", T.DoubleType(), True),
        T.StructField("time", T.TimestampType(), True),
        T.StructField("volume", T.IntegerType(), True),
        T.StructField("trade_type", T.StringType(), True),
    ]
)

#: Upsert key — Cassandra PRIMARY KEY (symbol, time, price),
#: clustering time DESC (main.rs:87-88, 145-146).
UPSERT_KEY = ("symbol", "time", "price")
