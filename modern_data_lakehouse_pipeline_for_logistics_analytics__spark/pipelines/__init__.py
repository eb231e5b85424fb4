from .bronze import generate_bronze_day, write_bronze_json
from .silver import SILVER_COLUMNS, silver_transform
from .gold import build_gold_tables

__all__ = [
    "generate_bronze_day",
    "write_bronze_json",
    "SILVER_COLUMNS",
    "silver_transform",
    "build_gold_tables",
]
