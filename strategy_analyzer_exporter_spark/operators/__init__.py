from strategy_analyzer_exporter_spark.operators.features import (
    FeatureConfig,
    features_df,
    features_sql,
)

__all__ = ["FeatureConfig", "features_df", "features_sql"]
