"""Command-line entry points.

One module per reference CLI, same flags and file formats (SURVEY §7):

  python -m dissc_tpu.cli.preprocess      <->  data/preprocess.py
  python -m dissc_tpu.cli.encode          <->  data/encode.py
  python -m dissc_tpu.cli.prep_dataset    <->  data/prep_dataset.py
  python -m dissc_tpu.cli.train_len       <->  train_len_predictor.py
  python -m dissc_tpu.cli.train_f0        <->  train_f0_predictor.py
  python -m dissc_tpu.cli.infer           <->  infer.py
  python -m dissc_tpu.cli.sr_train        <->  sr/train.py
  python -m dissc_tpu.cli.sr_inference    <->  sr/inference.py
  python -m dissc_tpu.cli.eval            <->  eval.py
  python -m dissc_tpu.cli.eval_sv         <->  eval_sv.py
  python -m dissc_tpu.cli.convert_eval    <->  scripts/convert_eval.py
  python -m dissc_tpu.cli.convert_eval_sv <->  scripts/convert_eval_sv.py
"""
