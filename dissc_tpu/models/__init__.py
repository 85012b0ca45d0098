from dissc_tpu.models import layers, prosody, hifigan, discriminators
