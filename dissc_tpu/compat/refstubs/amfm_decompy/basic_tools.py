"""amfm_decompy.basic_tools.SignalObj — the container pYAAPT consumes."""
import numpy as np


class SignalObj:
    def __init__(self, data, fs):
        self.data = np.asarray(data, np.float64).reshape(-1)
        self.fs = float(fs)
        self.size = self.data.size
