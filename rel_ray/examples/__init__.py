"""Worked plug-in examples for the protocols.py extension surface."""
