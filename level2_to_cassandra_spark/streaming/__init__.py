"""Reference-parity streaming engine.

The reference (/root/reference) is a Rust daemon: ZMQ SUB →
per-message JSON decode → demux BOOK/TICK → flatten/transform →
per-symbol daily-reset cumulative volume → per-row Cassandra upsert.
Here the same semantics are Structured Streaming:

    readStream (kafka | file | rate | memory)
      → demux(msg_type)                       [main.rs:75-167]
      → from_json + explode (BOOK)            [main.rs:77, 95-104]
      → projection: prefix strip, epoch-s→ts  [main.rs:62-64, §1.4 q1]
      → daily-reset cumsum per symbol         [main.rs:109-130]
      → dropDuplicatesWithinWatermark         [upsert key semantics]
      → foreachBatch upsert sink              [main.rs:96-104, 155-165]

All transformations are pure DataFrame→DataFrame functions usable on
batch OR streaming inputs — stream/batch parity is by construction,
and the batch window form of the cumsum is the test oracle for the
stateful streaming form.
"""
