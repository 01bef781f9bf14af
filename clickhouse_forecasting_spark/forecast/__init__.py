from .model import AdditiveForecastModel, fit_predict_frame
from .forecaster import SeriesForecaster

__all__ = ["AdditiveForecastModel", "fit_predict_frame", "SeriesForecaster"]
