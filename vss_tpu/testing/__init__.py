from vss_tpu.testing.sqllogic import SQLLogicRunner, run_sqllogic_file

__all__ = ["SQLLogicRunner", "run_sqllogic_file"]
