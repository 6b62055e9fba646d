Feature: Mixed int/float lists preserve numeric flavor (tagged cells)

  Scenario: ORDER BY across mixed numeric types
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1.5, 2, 0.5] AS x
      RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x   |
      | 0.5 |
      | 1.5 |
      | 2   |
      | 3   |

  Scenario: integer flavor survives UNWIND of a mixed list
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1.5] AS x RETURN x ORDER BY x DESC
      """
    Then the result should be, in order:
      | x   |
      | 3   |
      | 1.5 |

  Scenario: arithmetic on mixed-list elements keeps each element's flavor
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1.5] AS x RETURN x + 1 AS v ORDER BY v
      """
    Then the result should be, in order:
      | v   |
      | 2.5 |
      | 4   |

  Scenario: aggregation over mixed numeric elements
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1.5, 0.5] AS x RETURN sum(x) AS s, min(x) AS mn
      """
    Then the result should be, in any order:
      | s   | mn  |
      | 5.0 | 0.5 |

  Scenario: equality across int and float flavors unifies values
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1.5] AS x RETURN x = 3 AS a, x = 3.0 AS b ORDER BY x
      """
    Then the result should be, in order:
      | a     | b     |
      | false | false |
      | true  | true  |

  Scenario: mixed list equality against its float rendering
    Given an empty graph
    When executing query:
      """
      RETURN [3, 1.5] = [3.0, 1.5] AS v
      """
    Then the result should be, in any order:
      | v    |
      | true |

  Scenario: membership across flavors
    Given an empty graph
    When executing query:
      """
      RETURN 3 IN [3, 1.5] AS a, 3.0 IN [3, 1.5] AS b, 2 IN [3, 1.5] AS c
      """
    Then the result should be, in any order:
      | a    | b    | c     |
      | true | true | false |

  Scenario: toString of mixed-list elements collapses integer flavor
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1.5] AS x RETURN toString(x) AS s ORDER BY x
      """
    Then the result should be, in order:
      | s     |
      | '1.5' |
      | '3'   |

  Scenario: homogeneous int lists stay plain integers
    Given an empty graph
    When executing query:
      """
      UNWIND [1, 2, 3] AS x RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x |
      | 1 |
      | 2 |
      | 3 |

  Scenario: homogeneous float lists stay floats
    Given an empty graph
    When executing query:
      """
      UNWIND [1.5, 2.5] AS x RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x   |
      | 1.5 |
      | 2.5 |

  Scenario: null holes ride along in mixed lists
    Given an empty graph
    When executing query:
      """
      UNWIND [3, null, 1.5] AS x RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x    |
      | 1.5  |
      | 3    |
      | null |

  Scenario: returning the whole mixed list keeps both flavors
    Given an empty graph
    When executing query:
      """
      RETURN [3, 1.5] AS v
      """
    Then the result should be, in any order:
      | v        |
      | [3, 1.5] |

  Scenario: filtering on mixed elements compares numerically
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1.5, 0.5] AS x WITH x WHERE x > 1 RETURN x ORDER BY x
      """
    Then the result should be, in order:
      | x   |
      | 1.5 |
      | 3   |

  Scenario: collect of mixed elements round-trips
    Given an empty graph
    When executing query:
      """
      UNWIND [3, 1.5] AS x WITH x ORDER BY x RETURN collect(x) AS v
      """
    Then the result should be, in any order:
      | v        |
      | [1.5, 3] |
