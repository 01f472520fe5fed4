from barco_spark.sources.eventlog import EventLog  # noqa: F401
