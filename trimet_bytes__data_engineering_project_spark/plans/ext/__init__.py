"""Section modules of the scale-extensions corpus — split from
``plans/extensions.py`` (round 14, r13 verdict item 8).  Import the
aggregator ``plans.extensions`` (or ``plans`` itself), not the sections:
module import ORDER is registration order, and only the aggregator
guarantees it."""
