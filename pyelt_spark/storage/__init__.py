from pyelt_spark.storage.lake import LakeTable  # noqa: F401
