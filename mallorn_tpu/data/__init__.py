from mallorn_tpu.data.packing import PackedLightcurves, Metadata, pack_lightcurves
from mallorn_tpu.data.synthetic import generate_dataset
from mallorn_tpu.data.loader import load_all_data, load_lightcurves, load_metadata
