from instantvnr_tpu.accel.macrocell import (  # noqa: F401
    MacroCell,
    macrocell_dims,
    compute_value_ranges,
    update_explicit,
    update_max_opacity,
)
