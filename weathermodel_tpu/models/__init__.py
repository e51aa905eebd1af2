from weathermodel_tpu.models.weatherbert import WeatherBERT, WeatherAutoencoder, SimMTM
from weathermodel_tpu.models.weatherformer import (
    WeatherFormer,
    WeatherFormerSinusoid,
    WeatherFormerMixture,
)
