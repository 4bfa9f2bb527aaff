"""Wireless simulation backend (virtual ether, channel models, impairments)."""
