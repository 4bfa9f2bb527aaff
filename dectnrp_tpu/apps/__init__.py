"""User-facing apps (reference apps/): the scenario runner (dectnrp), the
UDP round-trip tester (rtt) and the deadline-scheduled UDP generator (sync).
"""
