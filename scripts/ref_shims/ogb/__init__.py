"""Import-time stand-in for ``ogb`` (`shaDow/metric.py:7-8`).  The
Evaluator classes are only *constructed* for ogb-metric datasets
(metric.py:45/50); the planted A/B uses the flickr/accuracy sklearn
path, so construction raises loudly if ever reached."""
