from dissc_tpu.eval.metrics import (
    aligned_ffe,
    calc_asr_er,
    edit_distance,
    get_yaapt,
    pitch_emd,
)
from dissc_tpu.eval.sv import compute_eer
