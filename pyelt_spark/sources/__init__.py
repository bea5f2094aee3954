from pyelt_spark.sources.events import transcript_change_events  # noqa: F401
