from binancedatapipeline_spark.plans.extreme import extreme_cases
from binancedatapipeline_spark.plans.margin import margin_assets
from binancedatapipeline_spark.plans.premium import premium_wma
from binancedatapipeline_spark.plans.validate import validate_klines

__all__ = ["extreme_cases", "margin_assets", "premium_wma", "validate_klines"]
