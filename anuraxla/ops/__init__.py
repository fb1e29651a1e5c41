from anuraxla.ops.frontend import log_mel_batch, rms_normalize_batch  # noqa: F401
from anuraxla.ops.mel import mel_filterbank, power_to_db  # noqa: F401
from anuraxla.ops.stft import stft_power  # noqa: F401
