from .planck import planck_function
from .rayleigh import rayleigh_molar_scattering_coeff
from .heating_rate import heating_rate
from .rt_lw import rt_lw, rt_lw_bb, rt_lw_bb_intervals
from .rt_sw import (rt_direct_sw, rt_norayleigh_sw, rt_direct_sw_bb,
                    rt_norayleigh_sw_bb, rt_sw_bb_intervals)
from .segments import interval_sum, interval_count, gpoint_onehot
from .average import (fit_optical_depth_lw, fit_optical_depth_sw,
                      fit_optical_depth_sw_total_trans,
                      average_od_to_gpoints, od_to_molar_abs)
from .cost import CostWeights, cost_ckd_lw, cost_ckd_sw
