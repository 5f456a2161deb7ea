from .exact import dec, money_sum, ratio_avg

__all__ = ["dec", "money_sum", "ratio_avg"]
