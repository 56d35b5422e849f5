from viforssms_tpu.data.features import (
    WindowTables,
    ar1_tables,
    gather_windows,
    lv_tables,
    sv_tables,
)
from viforssms_tpu.data.generate import generate_ar1, simulate_lv, simulate_fhn

__all__ = [
    "WindowTables",
    "ar1_tables",
    "gather_windows",
    "lv_tables",
    "sv_tables",
    "generate_ar1",
    "simulate_lv",
    "simulate_fhn",
]
