#ifndef GM_STUB_BOOST_ACCESS
#define GM_STUB_BOOST_ACCESS
#include <type_traits>
namespace boost { namespace serialization {
class access {
 public:
  template <class Archive, class T>
  static void serialize(Archive& ar, T& t, const unsigned int v) {
    t.serialize(ar, v);
  }
  /* member-serialize detector lives INSIDE access so private
   * serialize members (friend class access) are visible to the test */
  template <class A, class T>
  struct has_serialize {
    template <class U>
    static auto test(U* u)
        -> decltype(u->serialize(*(A*)0, 0u), std::true_type());
    template <class U>
    static std::false_type test(...);
    static const bool value = decltype(test<T>(0))::value;
  };
};
}}

/* split-member stub: serialize() dispatches to save()/load() by
 * archive direction (tag types defined here, archives inherit). */
namespace boost { namespace archive {
struct gm_saving_tag {};
struct gm_loading_tag {};
}}
namespace boost { namespace serialization {
template <class Archive, class T>
inline void gm_split(Archive& ar, T& t, const unsigned int v,
                     boost::archive::gm_saving_tag) {
  t.save(ar, v);
}
template <class Archive, class T>
inline void gm_split(Archive& ar, T& t, const unsigned int v,
                     boost::archive::gm_loading_tag) {
  t.load(ar, v);
}
}}
#define BOOST_SERIALIZATION_SPLIT_MEMBER() \
  template <class Archive> \
  void serialize(Archive& ar, const unsigned int version) { \
    boost::serialization::gm_split(ar, *this, version, \
        typename Archive::gm_direction()); \
  }
#endif
