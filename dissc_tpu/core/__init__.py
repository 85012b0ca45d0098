from dissc_tpu.core import seqops, masking
from dissc_tpu.core.config import AttrDict, load_config
