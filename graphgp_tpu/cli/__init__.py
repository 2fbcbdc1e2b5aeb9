"""Command-line experiment drivers: scaling, BO, ablation, regression."""
