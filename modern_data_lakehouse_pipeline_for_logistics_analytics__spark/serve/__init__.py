from .lookup import country_eta, log_prediction, point_lookup

__all__ = ["point_lookup", "country_eta", "log_prediction"]
