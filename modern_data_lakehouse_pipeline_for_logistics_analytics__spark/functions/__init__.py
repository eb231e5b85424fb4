from .scalar import eta_date, round_half_up, sql_round_half_up, try_to_number

__all__ = ["try_to_number", "eta_date", "round_half_up", "sql_round_half_up"]
