from .numeric import dec_avg, dec_sum

__all__ = ["dec_avg", "dec_sum"]
