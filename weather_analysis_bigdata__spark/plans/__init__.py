"""Physical-plan inspection utilities: the ".explain and iterate until
it's the plan you'd want" discipline, encoded as assertions so plan
regressions fail tests instead of shipping."""
