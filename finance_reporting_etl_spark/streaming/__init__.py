"""Time-bucketed aggregation: batch F.window now, Structured Streaming
AvailableNow as the daily-append upgrade path (SURVEY §2.8)."""
