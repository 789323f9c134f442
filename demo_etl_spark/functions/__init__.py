from demo_etl_spark.functions.scalars import (
    day_name_upper,
    final_price,
    is_weekend,
    money_round,
    month_name_upper,
    safe_ratio,
    tagged_id,
)

__all__ = [
    "money_round",
    "safe_ratio",
    "is_weekend",
    "day_name_upper",
    "month_name_upper",
    "final_price",
    "tagged_id",
]
