from strategy_analyzer_exporter_spark.sources.tables import TABLES, load_table
from strategy_analyzer_exporter_spark.sources.bars import bars_df, BARS_CTE

__all__ = ["TABLES", "load_table", "bars_df", "BARS_CTE"]
