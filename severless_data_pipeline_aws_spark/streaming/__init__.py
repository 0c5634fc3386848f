"""Structured Streaming parity (SURVEY §2.8, M3): the reference's
Kinesis → Lambda → DynamoDB pipeline re-expressed as
readStream → from_json → parquet landing, plus the stateful drift
generator (W4) and watermarked time-window aggregations (W6/W7)."""
