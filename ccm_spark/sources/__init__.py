from ccm_spark.sources.tables import load_table, events_pair_series

__all__ = ["load_table", "events_pair_series"]
