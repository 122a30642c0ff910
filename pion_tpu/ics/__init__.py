"""Initial-condition generators (the icgen equivalent).

Each generator returns a primitive-state array for a given
:class:`~pion_tpu.config.SimConfig` (reference: source/ics/icgen.cpp:83-257
dispatch at icgen_base.cpp:36-130).
"""
from .shocktube import brio_wu, shocktube, toro_tests  # noqa: F401
from .blast import blast_wave  # noqa: F401
from .advection import advection_pulse, advect_sine_wave  # noqa: F401
from .mhd2d import field_loop, orszag_tang  # noqa: F401
from .problems import (  # noqa: F401
    add_noise,
    double_mach_reflection,
    jet_ambient,
    jet_state,
    from_turbulence_cube,
    kelvin_helmholtz,
    laser_ablation,
    liska_wendroff_implosion,
    map_1d_to_2d,
    multi_clumps,
    photoevap_cloudclump,
    photoevap_paralleltest,
    photoevap_powerlaw,
    photoevap_radial,
    radiative_shock,
    radiative_shock_outflow,
    random_clumps,
    shock_cloud,
    photoevaporating_clump,
    spherical_clump,
    uniform,
)
from .starbench import (  # noqa: F401
    cone,
    contact_discontinuity,
    ifi_test,
    irradiated_cloud,
    planar_if,
    tremblin_cooling,
)
