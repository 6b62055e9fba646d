Feature: Operator precedence and numeric coercion

  Scenario: Multiplication binds tighter than addition
    Given an empty graph
    When executing query:
      """
      RETURN 2 + 3 * 4 AS a, (2 + 3) * 4 AS b
      """
    Then the result should be, in any order:
      | a  | b  |
      | 14 | 20 |

  Scenario: Exponentiation binds tighter than multiplication
    Given an empty graph
    When executing query:
      """
      RETURN 2 * 3 ^ 2 AS a
      """
    Then the result should be, in any order:
      | a    |
      | 18.0 |

  Scenario: Exponentiation is left-associative in Cypher
    Given an empty graph
    When executing query:
      """
      RETURN 2 ^ 3 ^ 2 AS a
      """
    Then the result should be, in any order:
      | a    |
      | 64.0 |

  Scenario: Unary minus on an expression
    Given an empty graph
    When executing query:
      """
      RETURN -(2 + 3) AS a, -2 + 3 AS b
      """
    Then the result should be, in any order:
      | a  | b |
      | -5 | 1 |

  Scenario: Modulo follows the sign of the dividend
    Given an empty graph
    When executing query:
      """
      RETURN 7 % 3 AS a, -7 % 3 AS b, 7 % -3 AS c
      """
    Then the result should be, in any order:
      | a | b  | c |
      | 1 | -1 | 1 |

  Scenario: Modulo on floats
    Given an empty graph
    When executing query:
      """
      RETURN 7.5 % 2 AS a
      """
    Then the result should be, in any order:
      | a   |
      | 1.5 |

  Scenario: Comparison binds tighter than NOT
    Given an empty graph
    When executing query:
      """
      RETURN NOT 1 > 2 AS a
      """
    Then the result should be, in any order:
      | a    |
      | true |

  Scenario: AND binds tighter than OR
    Given an empty graph
    When executing query:
      """
      RETURN true OR false AND false AS a, (true OR false) AND false AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | true | false |

  Scenario: XOR sits between AND and OR
    Given an empty graph
    When executing query:
      """
      RETURN true XOR true AND false AS a
      """
    Then the result should be, in any order:
      | a    |
      | true |

  Scenario: Integer plus float widens to float
    Given an empty graph
    When executing query:
      """
      RETURN 1 + 0.5 AS a, 4 / 2.0 AS b
      """
    Then the result should be, in any order:
      | a   | b   |
      | 1.5 | 2.0 |

  Scenario: Integer division by a larger integer is zero
    Given an empty graph
    When executing query:
      """
      RETURN 1 / 2 AS a, -1 / 2 AS b
      """
    Then the result should be, in any order:
      | a | b |
      | 0 | 0 |

  Scenario: IN binds tighter than AND
    Given an empty graph
    When executing query:
      """
      RETURN 1 IN [1, 2] AND 3 IN [3] AS a
      """
    Then the result should be, in any order:
      | a    |
      | true |

  Scenario: Arithmetic inside a comparison chain
    Given an empty graph
    When executing query:
      """
      RETURN 1 + 1 < 3 AS a, 2 * 2 >= 4 AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | true | true |

  Scenario: String concatenation chains left to right
    Given an empty graph
    When executing query:
      """
      RETURN 'a' + 'b' + 'c' AS s
      """
    Then the result should be, in any order:
      | s     |
      | 'abc' |

  Scenario: List concatenation with plus
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2] + [3] AS l, [] + [1] AS e
      """
    Then the result should be, in any order:
      | l         | e   |
      | [1, 2, 3] | [1] |

  Scenario: Appending a scalar to a list with plus
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2] + 3 AS l
      """
    Then the result should be, in any order:
      | l         |
      | [1, 2, 3] |
