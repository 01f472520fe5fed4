from barco_spark.sources.eventlog import EventLog  # noqa: F401
from barco_spark.sources.datasource import BarcoDataSource  # noqa: F401
