"""Query catalog: named DataFrame plans with ANSI-SQL oracles."""
