from pyelt_spark.plans.pipeline import TranscriptVault  # noqa: F401
