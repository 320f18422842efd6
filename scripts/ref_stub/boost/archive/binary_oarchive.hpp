/* Raw-byte archive stub: POD fields and vectors only — exactly the
 * surface GraphMat's serialize() members use.  NOT wire-compatible
 * with real boost; fine for single-process golden runs. */
#ifndef GM_STUB_BOOST_OARCH
#define GM_STUB_BOOST_OARCH
#include <iostream>
#include <vector>
#include <type_traits>
#include <boost/serialization/access.hpp>
namespace boost { namespace archive {

template <class A, class T>
using gm_has_serialize = boost::serialization::access::has_serialize<A, T>;

class binary_oarchive {
  std::ostream& os_;
 public:
  typedef gm_saving_tag gm_direction;
  explicit binary_oarchive(std::ostream& os) : os_(os) {}
  template <class T>
  typename std::enable_if<gm_has_serialize<binary_oarchive, T>::value,
                          binary_oarchive&>::type
  operator&(T& t) {
    boost::serialization::access::serialize(*this, t, 0u);
    return *this;
  }
  template <class T>
  typename std::enable_if<!gm_has_serialize<binary_oarchive, T>::value,
                          binary_oarchive&>::type
  operator&(const T& t) {
    os_.write((const char*)&t, sizeof(T));
    return *this;
  }
  template <class T>
  binary_oarchive& operator&(std::vector<T>& v) {
    size_t n = v.size();
    os_.write((const char*)&n, sizeof(n));
    for (size_t i = 0; i < n; i++) (*this) & v[i];
    return *this;
  }
  template <class T> binary_oarchive& operator<<(T& t) {
    return (*this) & t;
  }
  template <class T> binary_oarchive& operator<<(const T& t) {
    return (*this) & const_cast<T&>(t);
  }
};

class binary_iarchive {
  std::istream& is_;
 public:
  typedef gm_loading_tag gm_direction;
  explicit binary_iarchive(std::istream& is) : is_(is) {}
  template <class T>
  typename std::enable_if<gm_has_serialize<binary_iarchive, T>::value,
                          binary_iarchive&>::type
  operator&(T& t) {
    boost::serialization::access::serialize(*this, t, 0u);
    return *this;
  }
  template <class T>
  typename std::enable_if<!gm_has_serialize<binary_iarchive, T>::value,
                          binary_iarchive&>::type
  operator&(T& t) {
    is_.read((char*)&t, sizeof(T));
    return *this;
  }
  template <class T>
  binary_iarchive& operator&(std::vector<T>& v) {
    size_t n = 0;
    is_.read((char*)&n, sizeof(n));
    v.resize(n);
    for (size_t i = 0; i < n; i++) (*this) & v[i];
    return *this;
  }
  template <class T> binary_iarchive& operator>>(T& t) {
    return (*this) & t;
  }
};
}}
#endif
