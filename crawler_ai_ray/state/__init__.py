"""Stateful components held in Ray actors: the sharded URL-seen filter
and the sandbox page store (the "network")."""
