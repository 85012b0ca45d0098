from dissc_tpu.data.jsonl import read_unit_records, append_unit_record, write_unit_records
from dissc_tpu.data.stats import (
    calculate_pitch_stats,
    data_split,
    get_spkrs_dict,
    load_f0_stats,
    load_id_to_spkr,
    prep_stats_arrays,
    save_f0_stats,
    save_id_to_spkr,
)
