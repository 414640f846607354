from mallorn_tpu.models.data import (BandBatch, SequenceBatch,
                                     make_band_batch, make_sequence_batch)
from mallorn_tpu.models.lstm import LSTMClassifier
from mallorn_tpu.models.transformer import TransformerClassifier
from mallorn_tpu.models.atat import ATAT
from mallorn_tpu.models.gru import GRUClassifier
