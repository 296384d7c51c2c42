"""Minimum bracketing then Brent minimization (mirrors
russell_lab/examples/algo_min_bracketing_and_solver.rs)."""
import _prelude  # noqa: F401
from russell_tpu.algo import MinBracketing, MinSolver

f = lambda x, _args=None: (x - 1.5) ** 2 + 2.0
br = MinBracketing().set_enable_stats(True)
bracket = br.basic(0.0, f)
a, b, c = bracket.a, bracket.b, bracket.c
assert a < b < c and bracket.fb < bracket.fa and bracket.fb < bracket.fc
solver = MinSolver().set_enable_stats(True)
xmin = solver.brent(a, c, f)
print(f"bracket ({a:.4f}, {b:.4f}, {c:.4f}) -> xmin = {xmin:.10f}")
print("bracketing calls:", br.get_stats().n_function,
      "brent calls:", solver.get_stats().n_function)
assert abs(xmin - 1.5) < 1e-7
print("min bracketing + brent OK")
