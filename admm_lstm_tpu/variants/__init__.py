"""Solver variants beyond the core fast/no-dual-y pair (those live in
core/step.py as StepRules):

  grad_based — SGD/Adam/Adagrad BPTT baselines (reference C10)
  admm_l     — ADMM-LSTM-L: explicit pre-activation z variables (C11)
  admm_s     — ADMM-LSTM-S: biases + backward sweep + final-step duals (C12)
"""
