"""acmpc_tpu — a TPU-native autonomous-racing MPC framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
Adelaide-Autonomous-Racing-Kit/ac-mpc (reference mounted at /root/reference):
camera frames -> segmentation -> track-limit extraction -> particle-filter
localisation -> spatial-bicycle-model MPC -> actuator commands, plus mapping,
speed-profile precomputation, offline benchmarking and observability.

Design stance (see SURVEY.md §7): the reference is a CPU process-pipeline
around a C QP library; this framework inverts that into a single functional,
jitted, batched solve pipeline (waypoints -> speed QP -> linearise -> control
QP -> extract) sharded over a TPU device mesh, with a thin host-side
real-time shell around it.
"""

__version__ = "0.1.0"
