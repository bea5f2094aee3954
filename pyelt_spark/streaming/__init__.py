from pyelt_spark.streaming.runner import MicrobatchRunner  # noqa: F401
