from skellysim_tpu.solver.gmres import (gmres, GmresResult,  # noqa: F401
                                        gmres_segment, GmresCarry,
                                        GmresSegmentResult)
