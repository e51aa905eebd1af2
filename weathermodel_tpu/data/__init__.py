from weathermodel_tpu.data.chunks import (
    save_chunk,
    load_chunk,
    synthetic_chunk,
    chunk_path,
    write_synthetic_dataset,
)
from weathermodel_tpu.data.pretraining import (
    PretrainDataConfig,
    pretrain_batches,
    split_chunk_ids,
    derive_years,
)
from weathermodel_tpu.data.yield_data import (
    YieldArrays,
    YieldStats,
    get_train_test_arrays,
    read_usa_dataset,
    read_non_us_dataset,
    synthetic_yield_df,
)
from weathermodel_tpu.data.cropnet_data import (
    get_cropnet_train_test_arrays,
    read_cropnet_dataset,
    synthetic_cropnet_df,
)
from weathermodel_tpu.data import etl_noaa
